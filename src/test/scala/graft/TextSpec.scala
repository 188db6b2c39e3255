package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, TextOps}

/** Winnowing fingerprint properties that the hash-valued output can't
  * prove through the SQL oracle. */
class TextSpec extends SparkSpecBase {

  test("near-dup docs share most winnowing fingerprints; random pairs few") {
    val fps = TextOps.winnow(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    def overlap(a: Long, b: Long): Double = {
      val (x, y) = (fps(a), fps(b))
      x.intersect(y).size.toDouble / math.min(x.size, y.size)
    }
    val strong = DedupOps.queries("q45_ngram_jaccard")(spark, sfDir)
      .filter("jaccard >= 0.9").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(strong.nonEmpty)
    val strongMean = strong.map { case (a, b) => overlap(a, b) }.sum /
      strong.length
    val ids = fps.keys.toSeq.sorted
    val rnd = new scala.util.Random(3)
    val randMean = (1 to 300).map { _ =>
      overlap(ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length)))
    }.sum / 300.0
    assert(strongMean >= 0.5, s"strongMean=$strongMean")
    assert(strongMean > 2 * randMean,
      s"strongMean=$strongMean randMean=$randMean")
  }

  test("pack offsets: two-phase prefix sum == naive single-reducer window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = TextOps.queries("q77_pack_offsets")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    // the naive twin: correct but funnels everything through one task
    val w = Window.orderBy("doc_id").rowsBetween(Long.MinValue, -1)
    val naive = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n"))
      .withColumn("start_off", coalesce(sum("n").over(w), lit(0L)))
      .select(col("doc_id"), col("start_off"),
        (col("start_off") / 512).cast("long").as("first_seq"),
        ((col("start_off") + col("n") - 1) / 512).cast("long").as("last_seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == naive && got.nonEmpty)
    // sequences partition the token stream: consecutive docs abut
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 >= a._2) // offsets non-decreasing in doc order
    }
  }

  test("shard manifest: two-phase prefix count == naive global-window sharding") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = TextOps.queries("q136_shard_manifest")(spark, sfDir)
    // the naive twin: one global row_number window (single task)
    val naive = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("nc"))
      .withColumn("pos", row_number().over(
        Window.orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
        .cast("long") - 1)
      .withColumn("shard_id", expr("pos div 64"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("nc").as("chars_total"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
        expr("bit_xor(doc_id)").as("doc_xor"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    val n = got.count()
    assert(n > 0)
    // every shard full except possibly the last (fixed-size blocks)
    assert(got.filter(col("n_docs") =!= 64L).count() <= 1)
  }

  test("every doc with >= 4 tokens gets fingerprints, bounded by grams") {
    import org.apache.spark.sql.functions._
    val nDocs = Tables.load(spark, sfDir, "documents")
      .filter(size(split(lower(trim(col("text"))), "\\s+")) >= 4).count()
    val perDoc = TextOps.winnow(spark, sfDir)
      .groupBy("doc_id").count().collect()
    assert(perDoc.length == nDocs)
    assert(perDoc.forall(_.getLong(1) >= 1))
  }

  test("q126 bigram LM: n_bigrams == tokens-1 per doc, avg_logp < 0") {
    val lm = TextOps.queries("q126_bigram_lm")(spark, sfDir)
    val nToks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("nt"))
      .filter(col("nt") >= 2)
    val joined = lm.join(nToks, "doc_id").cache()
    assert(joined.count() == nToks.count()) // every eligible doc scored
    assert(joined.filter(col("n_bigrams") =!= col("nt") - 1).count() == 0)
    assert(joined.filter(col("avg_logp") >= 0).count() == 0)
    // hard floor: c2+0.5 >= 0.5 and c1 <= total bigram count, so no
    // bigram (hence no average) can score below ln(0.5/(T + 0.5|V|))
    val vocab = Tables.load(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    val totalBigrams = nToks.agg(sum(col("nt") - 1)).head().getLong(0)
    val floor = math.log(0.5 / (totalBigrams + 0.5 * vocab))
    assert(joined.filter(col("avg_logp") < floor).count() == 0)
    joined.unpersist()
  }

  test("q146 pii redact: exactly one planted email+phone per doc") {
    val perSource = TextOps.queries("q146_pii_redact")(spark, sfDir)
      .collect()
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      val docs = r.getAs[Long]("docs")
      assert(docs > 0)
      assert(r.getAs[Long]("emails") == docs, s"emails in $r")
      assert(r.getAs[Long]("phones") == docs, s"phones in $r")
      // every email plant shrinks to <EMAIL> and phone to <PHONE>
      assert(r.getAs[Long]("chars_removed") > 0)
    }
  }

  test("q147 constraints: clean corpus passes; planted violations caught") {
    import spark.implicits._
    val clean = TextOps.queries("q147_validate_constraints")(spark, sfDir)
      .collect()
    assert(clean.length == 6)
    assert(clean.forall(_.getAs[Boolean]("pass")), clean.mkString(";"))
    val doc = Seq(
      (0L, "hello world", "en", 11L), // ok
      (0L, "dup id here", "en", 11L), // duplicate doc_id
      (1L, "", "xx", 0L),             // empty text + bad lang
      (2L, "bad len", "fr", 99L))     // n_chars inconsistent
      .toDF("doc_id", "text", "lang", "n_chars")
    val emb = Seq((5L, Seq(0.1f, 0.2f))) // vec_id 5 has no document
      .toDF("vec_id", "embedding")
    val bad = TextOps.validateCorpus(spark, doc, emb).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bad("doc_id_unique") == 1L)
    assert(bad("doc_id_not_null") == 0L)
    assert(bad("n_chars_consistent") == 1L)
    assert(bad("lang_in_domain") == 1L)
    assert(bad("text_nonempty") == 1L)
    assert(bad("embeddings_ref_docs") == 1L)
  }

  test("q149 RepetitionStats == brute-force token statistics") {
    import spark.implicits._
    val texts = Seq(
      "a b a b a",          // top word a=3, top bigram "a b"=2
      "x",                  // single token: no bigrams
      "a a a a",            // "a a" x3
      "p q r s t",          // all distinct
      "the the the cat cat sat on the mat")
    val got = texts.toDF("text")
      .select(org.apache.spark.sql.graft.RepetitionStats
        .column(split(col("text"), " ")).as("r"))
      .select("r.total", "r.dist", "r.top", "r.top2")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val want = texts.map { t =>
      val toks = t.split(" ").toSeq
      val grams = toks.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      (toks.length, toks.distinct.length,
        toks.groupBy(identity).values.map(_.length).max,
        if (grams.isEmpty) 0
        else grams.groupBy(identity).values.map(_.length).max)
    }
    assert(got.toSeq == want)
  }

  test("q149 RepetitionStats: null tokens skipped, null-spanning bigrams dropped") {
    import spark.implicits._
    // array('a', NULL, 'a'): 2 words, no valid bigram (both span null)
    val r = Seq(1).toDF("i")
      .select(org.apache.spark.sql.graft.RepetitionStats.column(
        array(lit("a"), lit(null.asInstanceOf[String]), lit("a"))).as("r"))
      .select("r.total", "r.dist", "r.top", "r.top2").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      == ((2, 1, 2, 0)))
    // empty array: all zeros
    val e = Seq(1).toDF("i")
      .select(org.apache.spark.sql.graft.RepetitionStats.column(
        array().cast("array<string>")).as("r"))
      .select("r.total", "r.dist", "r.top", "r.top2").head()
    assert((e.getInt(0), e.getInt(1), e.getInt(2), e.getInt(3))
      == ((0, 0, 0, 0)))
  }

  test("q155 BPE learn: known merge sequence, overlap counts, ties, exhaustion") {
    import spark.implicits._
    // vocab {"aaab": 2, "ab": 3}. Round 1: (a,a) appears twice in
    // "aaab" (OVERLAPPING count) => 4; (a,b) => 2+3 = 5 -> merge "ab".
    // Round 2 ("aaab" is now <a><a><ab>): (a,a)=2 vs (a,ab)=2 TIE ->
    // lexicographic pair order ('<a><a>' < '<a><ab>' since '>' < 'b')
    // -> merge "aa". Round 3: (aa,ab)=2 -> merge "aaab". Round 4: no
    // pairs anywhere -> no merge recorded (loop exhausts gracefully).
    val words = Seq(("aaab", 2L), ("ab", 3L)).toDF("w", "freq")
    val (merges, vocab) = TextOps.bpeLearn(words, 4)
    assert(merges == Seq(
      (1, "<a><b>", "<ab>", 5L),
      (2, "<a><a>", "<aa>", 2L),
      (3, "<aa><ab>", "<aaab>", 2L)))
    val syms = vocab.collect()
      .map(r => r.getAs[String]("w") -> r.getAs[String]("sym")).toMap
    assert(syms("aaab") == "<aaab>" && syms("ab") == "<ab>")
  }

  test("q155 BPE merge replace is non-overlapping left-to-right") {
    import spark.implicits._
    // "aaa": pairs (a,a) x2, merge "aa" applies left-to-right once:
    // <aa><a>, never <a><aa> and never a double-consume
    val (m, v) = TextOps.bpeLearn(Seq(("aaa", 1L)).toDF("w", "freq"), 1)
    assert(m == Seq((1, "<a><a>", "<aa>", 2L)))
    assert(v.collect().head.getAs[String]("sym") == "<aa><a>")
  }

  test("q156 BPE apply: merges only ever shorten; totals close") {
    val rows = TextOps.queries("q156_bpe_apply")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // every merge shrinks a word's symbol count: tokens <= chars,
      // and at least one char per token survives
      assert(r.getAs[Long]("bpe_tokens") <= r.getAs[Long]("chars"),
        r.toString)
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("words"),
        r.toString)
      assert(r.getAs[Double]("compression") >= 1.0, r.toString)
    }
  }

  test("q177 Zipf: slope is negative, points track the vocabulary") {
    val r = TextOps.queries("q177_zipf_slope")(spark, sfDir).head()
    assert(r.getAs[Double]("slope") < 0,
      "rank-frequency slope must fall (counts decrease with rank)")
    val vocab = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .select("w").distinct().count()
    assert(r.getAs[Long]("n_points") == math.min(1000L, vocab))
  }

  test("q151 DSIR: one-pass LM equals the two-scan construction") {
    // the conditional-count trick (corpus count + target count in ONE
    // aggregate) must agree with independently built LMs
    val d = sfDir
    val toks = TextOps.queries("q151_dsir_weights")(spark, d)
    assert(toks.count() == 20)
    val docs = graft.Tables.load(spark, d, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
    val corpus = docs.groupBy("t").count()
    val target = docs.filter(col("doc_id") % 7 === 0).groupBy("t")
      .agg(count(lit(1)).as("tc"))
    val onePass = docs
      .withColumn("is_tgt", col("doc_id") % 7 === 0)
      .groupBy("t").agg(count(lit(1)).as("cc"),
        sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"))
    val joined = onePass.join(corpus, "t")
      .join(target, Seq("t"), "left")
      .filter(col("cc") =!= col("count")
        || coalesce(col("tc"), lit(0L)) =!= col("ct"))
    assert(joined.count() == 0)
  }

  test("q308 DoReMi weights: DRO direction, exact fixed point, " +
      "ppm normalization") {
    val rows = TextOps.queries("q308_doremi_weights")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("loss_fp"), r.getAs[Long]("weight_ppm")))
    assert(rows.length == 20, "sources are a 20-value enum at every sf")
    // DRO direction: weight must be MONOTONE in domain loss (higher
    // mixture loss -> more weight) — the factor is monotone in loss
    // and every round applies the same reference to all domains
    val byLoss = rows.sortBy(_._3)
    assert(byLoss.map(_._4).sliding(2).forall(p => p(0) <= p(1)),
      "weights must not invert the loss order")
    assert(byLoss.last._4 > byLoss.head._4,
      "spread domains must separate")
    // ppm normalization: floor division loses < 1 ppm per domain
    val total = rows.map(_._4).sum
    assert(total <= 1000000L && total > 1000000L - rows.length)
    // exact fixed point: replicate the 5-round BIGINT update
    // independently from the domain aggregates
    val S = 1000000L
    val mn = rows.map(_._3).min
    val spr = math.max(rows.map(_._3).max - mn, 1L)
    var w = rows.map(_ => S)
    for (_ <- 1 to 5) {
      val ref = rows.zip(w).map { case ((_, _, l, _), wi) =>
        wi * l }.sum / w.sum
      val rt = ((ref - mn) * S / spr) / 4
      w = rows.zip(w).map { case ((_, _, l, _), wi) =>
        wi * (S + ((l - mn) * S / spr) / 4 - rt) / S
      }
    }
    val sumW = w.sum
    rows.zip(w).foreach { case ((src, _, _, ppm), wi) =>
      assert(ppm == wi * S / sumW, s"$src weight diverged")
    }
  }

  test("q194 kappa is consistent with q193's matrix and bounded") {
    val m = TextOps.queries("q193_lang_confusion")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n")))
    val k = TextOps.queries("q194_cohens_kappa")(spark, sfDir).head()
    // recompute every scalar from the matrix independently
    val total = m.map(_._3).sum
    val diag = m.filter(r => r._1 == r._2).map(_._3).sum
    val labels = (m.map(_._1) ++ m.map(_._2)).distinct
    val pe = labels.map(l =>
      m.filter(_._1 == l).map(_._3).sum
        * m.filter(_._2 == l).map(_._3).sum).sum
    assert(k.getAs[Long]("n") == total)
    assert(k.getAs[Long]("diag") == diag)
    assert(k.getAs[Long]("pe_num") == pe)
    assert(k.getAs[Long]("kappa_num") == total * diag - pe)
    assert(k.getAs[Long]("kappa_den") == total * total - pe)
    val kappa = k.getAs[Double]("kappa")
    // the synthetic corpus draws tokens independently of its lang
    // label, so TRUE agreement is chance-level: kappa must sit near 0
    // (a missing chance correction — e.g. dropping pe_num — would
    // read the raw ~20% accuracy as a strongly positive kappa)
    assert(kappa > -0.2 && kappa < 0.2,
      s"chance-level agreement must yield kappa ~ 0: $kappa")
    val accuracy = diag.toDouble / total
    assert(accuracy > 0.05, s"accuracy $accuracy") // diag not empty
    // the matrix itself tiles the corpus exactly once
    assert(total == Tables.load(spark, sfDir, "documents").count())
  }

  test("q202 PMI: integer ranking key and marginals on a crafted corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // bigrams: (a,b)x2, (a,c)x1, (d,c)x1; N=4; left a=3 d=1;
    // right b=2 c=2
    val docs = Seq("a b", "a b", "a c", "d c").toDF("text")
    val out = operators.TextOps.pmiCollocations(docs, minCount = 1)
      .orderBy(col("r").desc, col("a"), col("b")).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"),
        r.getAs[Long]("c_b"), r.getAs[Long]("r"),
        r.getAs[Double]("pmi")))
    // r = c_ab*4e6 div (c_a*c_b): (d,c) 2e6 > (a,b) 1333333 > (a,c) 666666
    assert(out.map(t => (t._1, t._2)).toSeq
      == Seq(("d", "c"), ("a", "b"), ("a", "c")))
    assert(out(0) == (("d", "c", 1L, 1L, 2L, 2000000L,
      math.rint(math.log(2.0) * 1e6) / 1e6)))
    assert(out(1)._6 == 1333333L && out(1)._4 == 3L && out(1)._5 == 2L)
    assert(out(2)._6 == 666666L)
    // min-count gate: at 2 only the repeated pair survives
    assert(operators.TextOps.pmiCollocations(docs, minCount = 2)
      .count() == 1)
  }

  test("q188 chi2: closed-form corners on a crafted 2-class corpus") {
    import spark.implicits._
    // 4 docs, 2 langs: 'aa' appears in exactly the two 'x' docs
    // (perfect separator), 'cc' in every doc (no signal), 'bb' in one
    // doc of each lang (no signal either — same rate per class)
    val docs = Seq(
      (1L, "x", "aa cc bb"), (2L, "x", "aa cc"),
      (3L, "y", "cc bb"), (4L, "y", "cc dd")
    ).toDF("doc_id", "lang", "text")
    val chi = TextOps.tokenClassChi2(docs).collect()
      .map(r => r.getAs[String]("token")
        -> (r.getAs[Long]("n_docs"), r.getAs[Double]("chi2"))).toMap
    // perfect separator scores the table total D = 4
    assert(chi("aa") == (2L, 4.0))
    // a token in every doc carries zero signal (absent row guarded)
    assert(chi("cc") == (4L, 0.0))
    // equal per-class rates -> 0
    assert(chi("bb")._2 == 0.0)
    // class-rename invariance: swapping the lang labels moves nothing
    val renamed = TextOps.tokenClassChi2(docs.withColumn("lang",
      when(col("lang") === "x", "y").otherwise("x"))).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Double]("chi2"))
      .toMap
    chi.foreach { case (t, (_, v)) =>
      assert(math.abs(renamed(t) - v) < 1e-12, t)
    }
  }

  test("q225 novelty: closed forms on identical vs all-distinct corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10 identical docs, 6 tokens each => 2 shingles per doc, first
    // doc owns both; bucket k holds exactly doc k (ids 0..9)
    val same = (0L until 10L).map(i => (i, "a b c d e f"))
      .toDF("doc_id", "text")
    val out = TextOps.ngramNovelty(same).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"))).toMap
    assert(out.size == 10)
    assert(out(0L) == ((2L, 2L, 1.0)))
    (1L to 9L).foreach(bkt => assert(out(bkt) == ((2L, 0L, 0.0)), bkt))
    // all-distinct corpus: every shingle is a first occurrence
    val uniq = (0L until 10L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e"))
      .toDF("doc_id", "text")
    TextOps.ngramNovelty(uniq).collect().foreach { r =>
      assert(r.getAs[Double]("novelty") == 1.0, r.toString)
    }
    // short docs (< 5 tokens) produce no shingles and no buckets
    assert(TextOps.ngramNovelty(
      Seq((0L, "a b c"), (1L, "x y")).toDF("doc_id", "text"))
      .count() == 0)
  }

  test("q227 KN bigram: exact rational algebra on a crafted corpus") {
    import spark.implicits._
    // corpus: "san francisco" x5, "over the" / "under the" /
    // "across the" -> bigram TYPES: (san,francisco), (over,the),
    // (under,the), (across,the); T = 4.
    val docs = Seq(
      "san francisco", "san francisco", "san francisco",
      "san francisco", "san francisco",
      "over the", "under the", "across the"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = TextOps.knBigramProb(docs, k = 10).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) -> r)
      .toMap
    // (san, francisco): c12=5, c1=5, nl=1, cr=1, T=4
    // num = max(20-3,0)*4 + 3*1*1 = 71; den = 4*5*4 = 80
    val sf = rows(("san", "francisco"))
    assert(sf.getAs[Long]("kn_num") == 71L)
    assert(sf.getAs[Long]("kn_den") == 80L)
    assert(sf.getAs[Double]("p_mle") == 1.0)
    assert(sf.getAs[Double]("p_kn") == 0.8875)
    // (over, the): c12=1, c1=1, nl=1, cr=3
    // num = max(4-3,0)*4 + 3*1*3 = 13; den = 4*1*4 = 16
    val ot = rows(("over", "the"))
    assert(ot.getAs[Long]("kn_num") == 13L)
    assert(ot.getAs[Long]("kn_den") == 16L)
    assert(ot.getAs[Double]("p_kn") == 0.8125)
    // smoothing strictly discounts the MLE everywhere (D > 0 and the
    // backoff never fully restores it when cr < T)
    rows.values.foreach { r =>
      assert(r.getAs[Double]("p_kn") < r.getAs[Double]("p_mle") + 1e-9,
        r.toString)
    }
  }

  test("q250 source KL: identical sources score 0, disjoint ln 2") {
    import spark.implicits._
    def kl(rows: (String, String)*) =
      TextOps.sourceUnigramKl(rows.toDF("source", "text")).collect()
        .map(r => r.getAs[String]("source")
          -> r.getAs[Double]("kl_vs_global")).toMap
    // identical per-source distributions: p_s == p_g, every ln is
    // ln(1) = 0 EXACTLY
    val same = kl(("A", "a b"), ("B", "a b"))
    assert(same == Map("A" -> 0.0, "B" -> 0.0))
    // disjoint single-token sources of equal mass: each term is
    // ln(c·N/(n_s·c_t)) = ln(2·4/(2·2)) = ln 2; KL = (2·ln2)/2
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r8(v: Double) = BigDecimal(v)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dis = kl(("A", "a a"), ("B", "b b"))
    assert(dis("A") == r6(r8(math.log(2.0))))
    assert(dis("B") == r6(r8(math.log(2.0))))
  }

  test("q249 skip-gram pairs: exact window pairs on crafted docs") {
    import spark.implicits._
    // "a b c" at window 2: all 6 ordered pairs, each once
    val r = TextOps.skipgramPairs(
      Seq((1L, "a b c")).toDF("doc_id", "text"), window = 2, topK = 20)
      .collect()
    val got = r.map(x => (x.getString(0), x.getString(1),
      x.getAs[Long]("n_occ"))).toSet
    assert(got == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L),
      ("b", "c", 1L), ("c", "a", 1L), ("c", "b", 1L)))
    assert(r.head.getAs[Long]("n_pairs_total") == 6L)
    assert(r.head.getAs[Long]("n_pair_types") == 6L)
    // a 1-token doc contributes nothing; a repeated bigram accumulates
    val r2 = TextOps.skipgramPairs(
      Seq((1L, "x"), (2L, "p q"), (3L, "p q")).toDF("doc_id", "text"),
      window = 2, topK = 20).collect()
    val m2 = r2.map(x => (x.getString(0), x.getString(1))
      -> x.getAs[Long]("n_occ")).toMap
    assert(m2 == Map(("p", "q") -> 2L, ("q", "p") -> 2L))
  }

  test("q242 perplexity filter: exact KN closed forms per document") {
    import spark.implicits._
    def r6d(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r8d(v: Double) = BigDecimal(v)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    // single bigram type across the corpus: T=1, nl=cr=1 ->
    // p = (4c-3+3)/4c = 1 EXACTLY -> nll 0 for every doc
    val mono = Seq((1L, "a a a a"), (2L, "a a")).toDF("doc_id", "text")
    val r1 = TextOps.knDocPerplexity(mono).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("mean_nll"))))
      .toMap
    assert(r1(1L) == ((3L, 0.0)) && r1(2L) == ((1L, 0.0)))
    // dominant bigram scores BELOW the rare one: 3x "a b" + 1x "c d"
    // p(ab) = (max(12-3,0)*2 + 3)/(4*3*2) = 21/24
    // p(cd) = (max(4-3,0)*2 + 3)/(4*1*2) = 5/8
    val mix = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "c d"))
      .toDF("doc_id", "text")
    val r2 = TextOps.knDocPerplexity(mix).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_nll"))
      .toMap
    assert(r2(1L) == r2(2L) && r2(2L) == r2(3L), "identical docs tie")
    assert(r2(1L) == r6d(r8d(-math.log(21.0 / 24.0))))
    assert(r2(4L) == r6d(r8d(-math.log(5.0 / 8.0))))
    assert(r2(1L) < r2(4L), "formulaic doc must score more fluent")
  }

  test("q230 mixture weights: uniform stays uniform, small sources " +
      "get boosted above their raw share") {
    import spark.implicits._
    // equal sources: 2 docs x 3 tokens each -> all weights 0.5
    val eq = Seq(("a", "x y z"), ("b", "p q r"))
      .toDF("source", "text")
    TextOps.mixtureWeights(eq).collect().foreach { r =>
      assert(r.getAs[Double]("raw_share") == 0.5)
      assert(r.getAs[Double]("weight") == 0.5)
      assert(r.getAs[Double]("eff_epochs") == 1.0)
    }
    // skewed: source a has 16 tokens, b has 1 -> alpha=0.3 flattens:
    // b's weight > b's raw share, a's weight < a's raw share;
    // weights sum to ~1
    val sk = Seq(
      ("a", (1 to 16).map(i => s"w$i").mkString(" ")), ("b", "solo"))
      .toDF("source", "text")
    val m = TextOps.mixtureWeights(sk).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(m("b").getAs[Double]("weight") >
      m("b").getAs[Double]("raw_share"))
    assert(m("a").getAs[Double]("weight") <
      m("a").getAs[Double]("raw_share"))
    assert(math.abs(m("a").getAs[Double]("weight") +
      m("b").getAs[Double]("weight") - 1.0) < 1e-5)
    assert(m("b").getAs[Double]("eff_epochs") > 1.0)
  }

  test("q235 CDC chunks: content-locality — an inserted prefix " +
      "re-fingerprints ONE chunk, fixed-size would shift them all") {
    import spark.implicits._
    // 'g' (103 % 8 = 7) is a boundary token; 'x' (120 % 8 = 0) is not
    val a = Seq((0L, "a b g c d g e f")).toDF("doc_id", "text")
    val b = Seq((1L, "x a b g c d g e f")).toDF("doc_id", "text")
    def fps(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      TextOps.cdcChunks(df).collect()
        .map(r => r.getAs[Long]("chunk") -> r.getAs[String]("fp"))
        .sortBy(_._1)
    val fa = fps(a); val fb = fps(b)
    // same chunk structure: [.. g][c d g][e f]
    assert(fa.length == 3 && fb.length == 3)
    // first chunk differs (the insertion landed there)...
    assert(fa.head._2 != fb.head._2)
    // ...every later chunk fingerprint SURVIVES the insertion
    assert(fa.drop(1).map(_._2) == fb.drop(1).map(_._2))
  }

  test("q235 CDC chunks: boundary rule and census are exact") {
    import spark.implicits._
    // "g" ends a chunk; trailing boundary produces no empty chunk
    val one = TextOps.cdcChunks(
      Seq((0L, "a g b g")).toDF("doc_id", "text")).collect()
    assert(one.length == 2)
    assert(one.map(_.getAs[Long]("ntok")).sorted.toSeq == Seq(2L, 2L))
    // identical docs dedup to the same fingerprints
    val dup = TextOps.cdcChunks(
      Seq((0L, "a b g c d"), (1L, "a b g c d"))
        .toDF("doc_id", "text"))
      .groupBy("fp").count().collect()
    assert(dup.length == 2 && dup.forall(_.getAs[Long]("count") == 2L))
  }

  test("q226 continuation counts: frequency is not predictability") {
    import spark.implicits._
    // "san francisco" 5x: francisco is FREQUENT (5 occurrences) but
    // follows only one context; "the" follows 3 distinct contexts
    // despite fewer occurrences. Continuation ranks the, francisco.
    val docs = Seq(
      "san francisco", "san francisco", "san francisco",
      "san francisco", "san francisco",
      "over the", "under the", "across the"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = TextOps.knContinuation(docs, k = 10).collect()
      .map(r => r.getAs[String]("w") ->
        (r.getAs[Long]("cont"), r.getAs[Long]("total_types"),
          r.getAs[Double]("p_cont"))).toMap
    // bigram TYPES: (san,francisco), (over,the), (under,the),
    // (across,the) => total 4
    assert(rows("the") == ((3L, 4L, 0.75)))
    assert(rows("francisco") == ((1L, 4L, 0.25)))
    // ranking: "the" first despite 3 < 5 occurrences
    val top = TextOps.knContinuation(docs, k = 1).collect()
    assert(top.head.getAs[String]("w") == "the")
  }

  test("q253 repetition filter: closed forms, short-doc degenerate") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b a b a b"), // pure repetition: both fractions 1.0
      (1L, "a b c d e f"), // all distinct: top2 = 2/6, dup3 = 0
      (2L, "x"), // too short for any gram: kept, zero everything
      (3L, "a b c a b c a b x") // mixed: top2 'a b' x3 -> 6/9
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionFilter(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("n_tokens"), x.getAs[Long]("top2_count"),
          x.getAs[Double]("top2_cov"), x.getAs[Double]("dup3_frac"),
          x.getAs[Boolean]("keep"))).toMap
    assert(r(0L) == ((6, 3L, 1.0, 1.0, false)))
    assert(r(1L) == ((6, 1L, math.rint(2e6 / 6) / 1e6, 0.0, false)))
    // doc 1: top2_cov = 2/6 = 0.333333 > 0.2 -> filtered even though
    // nothing repeats; that's the Gopher rule being length-sensitive
    // on tiny docs, exactly as published (short docs score high)
    assert(r(2L) == ((1, 0L, 0.0, 0.0, true)))
    // doc 3: bigrams: "a b"x3, "b c"x2, "c a"x2, "b x" -> top2 3;
    // trigrams: "a b c"x2, "b c a"x1? no — positions: a b c a b c a b x
    // -> "a b c"x2, "b c a"x2, "c a b"x2, "a b x"x1: dup3 = 6/7
    assert(r(3L) == ((9, 3L, math.rint(6e6 / 9) / 1e6,
      math.rint(6e6 / 7) / 1e6, false)))
  }

  test("q258 Aho-Corasick: overlaps, shared prefixes, brute equality") {
    val dict = Seq("a b", "b a", "a b c", "c c c").map(_.split(" "))
    val ac = new TextOps.TokenAhoCorasick(dict)
    // hand case: overlapping + nested matches all count
    val m = ac.matches("a b a b c a".split(" "))
    assert(m.toSet == Set((0, 1, 2), (1, 2, 2), (0, 3, 2), (2, 3, 3)))
    // shared-prefix completion at the END of input (the failure-link
    // corner: "a b c" must fire even though "a b" already did)
    assert(ac.matches("x a b c".split(" ")).toSet ==
      Set((0, 2, 2), (2, 2, 3)))
    // self-overlapping pattern: "c c c" in "c c c c" fires twice
    assert(ac.matches("c c c c".split(" "))
      .count(_._1 == 3) == 2)
    // brute-force equality on a pseudo-random token stream
    val alpha = Array("a", "b", "c", "x")
    val toks = Array.tabulate(200)(i => alpha((i * 7 + i * i * 3) % 4))
    val brute = for {
      (p, id) <- dict.zipWithIndex
      s <- 0 to toks.length - p.length
      if toks.slice(s, s + p.length).sameElements(p)
    } yield (id, s + 1, p.length)
    assert(ac.matches(toks).sorted == brute.sorted.toSeq)
    // empty input, no matches
    assert(ac.matches(Array.empty[String]).isEmpty)
  }

  test("q253 repetition filter: a clean long doc is kept") {
    import spark.implicits._
    // 20 distinct tokens: top2_cov = 2/20 = 0.1 <= 0.2, dup3 = 0
    val clean = (0 until 20).map(i => s"w$i").mkString(" ")
    val r = TextOps.repetitionFilter(Seq((0L, clean)).toDF("doc_id", "text"))
      .collect().head
    assert(r.getAs[Double]("top2_cov") == 0.1)
    assert(r.getAs[Double]("dup3_frac") == 0.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("q279 SRT: strict grammar round-trip; malformed cues FAIL") {
    val toks = "alpha beta gamma delta eps zeta eta theta iota kappa"
      .split(" ")
    val srt = TextOps.encodeSrt(7L, toks) // 2 cues, duration 2007 ms
    val (nc, speech, span, chars) = TextOps.parseSrt(7L, srt)
    assert(nc == 2 && speech == 2 * 2007L && span == 2500L + 2007L)
    assert(chars == toks.map(_.length).sum + 4 * 2)
    // overlapping cue: cue 2 restarts before cue 1 ends
    intercept[IllegalArgumentException] {
      TextOps.parseSrt(1L, srt.replace("00:00:02,500", "00:00:01,000"))
    }
    // decimal-dot timestamps (the WebVTT syntax) are NOT SRT
    intercept[IllegalArgumentException] {
      TextOps.parseSrt(2L, srt.replaceFirst(",", "."))
    }
    // non-consecutive cue index
    intercept[IllegalArgumentException] {
      TextOps.parseSrt(3L, srt.replaceFirst("1\r\n00", "9\r\n00"))
    }
    // end before start
    intercept[IllegalArgumentException] {
      TextOps.parseSrt(4L, srt.replace(
        "00:00:00,000 --> 00:00:02,007",
        "00:00:02,007 --> 00:00:00,000"))
    }
  }

  test("q265 UTF-8 census: RFC 3629 corners on crafted streams") {
    def c(bytes: Int*) =
      TextOps.utf8Census(0L, bytes.map(_.toByte).toArray)
    // valid 4-byte U+1F600 — one supplementary codepoint
    val ok4 = c(0xF0, 0x9F, 0x98, 0x80)
    assert(ok4.n_4byte == 1 && ok4.n_invalid == 0 &&
      ok4.n_codepoints == 1)
    // U+10FFFF (F4 8F BF BF): the LAST valid codepoint
    val last = c(0xF4, 0x8F, 0xBF, 0xBF)
    assert(last.n_4byte == 1 && last.n_invalid == 0)
    // surrogate ED A0 80: three invalid events (one-byte advance)
    assert(c(0xED, 0xA0, 0x80).n_invalid == 3)
    // overlong 2-byte C0 AF
    assert(c(0xC0, 0xAF).n_invalid == 2)
    // overlong 3-byte E0 80 80 (E0 requires A0..BF second)
    assert(c(0xE0, 0x80, 0x80).n_invalid == 3)
    // truncated € at EOF
    assert(c(0xE2, 0x82).n_invalid == 2)
    // beyond U+10FFFF (F4 90 80 80)
    assert(c(0xF4, 0x90, 0x80, 0x80).n_invalid == 4)
    // the plant: 80 ASCII bytes → two é at offsets 40/80, nothing else
    val pc = TextOps.utf8Census(1L,
      TextOps.plantUtf8(Array.fill(80)('x'.toByte)))
    assert(pc.n_ascii == 80 && pc.n_2byte == 2 && pc.n_invalid == 0)
    assert(pc.n_bytes == 84 && pc.n_codepoints == 82)
  }

  test("q264 Misra-Gries: k-bounded state, heavy item survives") {
    // 60 'hot' among 200 distinct cold items, k = 10: N = 260, the
    // guarantee keeps any item with count > N/(k+1) ≈ 23.6 — 'hot'
    // must exit with counter ≥ 60 − 23.6 > 0 no matter the order.
    // Interleave so decrements genuinely fire.
    val stream = (0 until 200).flatMap { i =>
      Seq(s"cold$i") ++ (if (i % 10 < 3) Seq("hot", "hot") else Nil)
    }
    val out = TextOps.misraGries(stream.iterator, 10).toMap
    assert(out.size <= 10, s"state exceeded k: ${out.size}")
    assert(out.contains("hot"), "heavy item evicted — guarantee broken")
    // counter is an UNDERcount, never an overcount
    assert(out("hot") <= 120)
    val exact = stream.groupBy(identity).view.mapValues(_.size)
    out.foreach { case (w, c) => assert(c <= exact(w)) }
  }

  test("q264 boilerplate HH: exactly the template's interior shingles") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val nEn = docs.filter(col("lang") === "en").count()
    val rows = TextOps.boilerplateHeavyHitters(docs).collect()
    // 8-token template → exactly four 5-gram interior shingles; all
    // boundary shingles (template tail × first text words) sit far
    // below the 1/200 threshold
    assert(rows.length == 4, s"got ${rows.map(_.getString(0)).toSeq}")
    val tmpl = TextOps.BoilerplateTemplate.split(" ")
    val want = (0 to 3).map(i => tmpl.slice(i, i + 5).mkString(" ")).toSet
    assert(rows.map(_.getString(0)).toSet == want)
    rows.foreach(r => assert(r.getAs[Long]("cnt") == nEn,
      s"template shingle count != en-doc count $nEn"))
  }

  test("q293 unigram Viterbi: frequent bigram piece beats chars; " +
      "rare pair falls back to characters") {
    import spark.implicits._
    // 60×"ab" + 5×"abab" + 1×"cd": W=66, thr=max(2, 66/50)=2, so
    // "ab" (70), "ba"/"aba"/"bab" (5) clear it but "cd" (1) does not
    val text = (Seq.fill(60)("ab") ++ Seq.fill(5)("abab") :+ "cd")
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = TextOps.unigramSegment(docs, topK = 50).collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Int]("n_pieces"), r.getAs[Long]("cost_fp"))).toMap
    // "ab" is one piece; "abab" is exactly ab+ab (cost additivity
    // pins the DP — not aba+b, not four chars)
    assert(rows("ab")._1 == 1)
    assert(rows("abab")._1 == 2)
    assert(rows("abab")._2 == 2 * rows("ab")._2)
    // "cd" has no multigram piece: two character pieces
    assert(rows("cd")._1 == 2)
    // frequency ordering: "ab" (60) outranks "abab" (5)
    val order = TextOps.unigramSegment(docs, topK = 50).collect()
      .map(_.getAs[String]("word")).toSeq
    assert(order == Seq("ab", "abab", "cd"))
  }
}
