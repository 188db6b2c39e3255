package graft

import org.apache.spark.sql.Row

import graft.operators.{DedupOps, TextOps, VectorOps}

/** Dedup-pipeline invariants that the DuckDB oracle can't express
  * (hash-dependent or approximate paths). */
class DedupSpec extends SparkSpecBase {

  private def pairs(name: String): Set[(Long, Long)] =
    DedupOps.queries(name)(spark, sfDir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-lsh finds exactly the exact-jaccard pairs at this sf") {
    assert(pairs("q46_minhash_lsh") == pairs("q45_ngram_jaccard"))
  }

  test("prefix-filtered ppjoin is exact: == the full inverted-index join") {
    assert(pairs("q56_jaccard_ppjoin") == pairs("q45_ngram_jaccard"))
  }

  test("dup clusters are consistent with the pair graph") {
    import org.apache.spark.sql.functions._
    val prs = pairs("q45_ngram_jaccard")
    val clusters = DedupOps.queries("q65_dup_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every clustered doc count == number of distinct docs in pairs
    val docs = prs.flatMap(p => Seq(p._1, p._2))
    assert(clusters.map(_._2).sum == docs.size)
    // cluster_id is the min member; max_member is a member >= it
    assert(clusters.forall { case (cid, _, mx) => mx >= cid })
    // both endpoints of every pair land in the SAME cluster: rebuild
    // membership from a driver-side union-find and compare sizes
    val parent = scala.collection.mutable.Map(docs.toSeq.map(d => d -> d): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    prs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = docs.groupBy(find).map { case (r, m) => (r, m.size.toLong) }
    assert(clusters.map(c => (c._1, c._2)).toMap == want)
    // the keeper of each cluster is one of its members
    val keepers = DedupOps.queries("q66_dedup_keep_best")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(keepers.length == clusters.length)
    assert(keepers.forall { case (cid, k) => find(k) == cid })
  }

  test("prefix filter prunes the candidate space by >= 5x") {
    // The structural claim behind q56: the inverted-index join must
    // verify every pair sharing ANY shingle; the prefix filter only
    // pairs sharing a RARE (prefix) shingle. At sf0.1 the reduction
    // is ~26x (1.13M -> 43.5k candidates); assert a conservative 5x
    // here so the test is robust across SFs.
    import org.apache.spark.sql.functions._
    val sh = DedupOps.docShingles(spark, sfDir).cache()
    try {
      val inv = DedupOps.postings(sh).cache()
      val full = inv.as("a").join(inv.as("b"),
          col("a.shingle") === col("b.shingle")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      val pruned = DedupOps.prefixCandidates(sh).count()
      assert(pruned * 5 <= full,
        s"prefix filter too weak: $pruned candidates vs $full full")
      inv.unpersist()
    } finally sh.unpersist()
  }

  test("simhash blocking is exact: blocked pairs == brute-force pairs") {
    // recompute hamming brute-force over INDEPENDENTLY computed
    // simhashes (SQL HOFs, interpreted) — cross-checks the codegen'd
    // SimHash64 expression bit for bit
    val blocked = DedupOps.simhashPairs(DedupOps.simhashes(spark, sfDir))
      .select("a_id", "b_id", "hamming").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // brute force from the sim signatures themselves: rebuild via the
    // same expr by joining every pair through a cross of doc ids is
    // O(n^2) — acceptable at sf0.001 (500 docs).
    import org.apache.spark.sql.functions._
    val sims = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_distinct(TextOps.tokens(col("text"))).as("tk"))
      .select(col("doc_id"), expr(
        """transform(sequence(0, 63), bit ->
          |  aggregate(tk, 0, (acc, t) ->
          |    acc + int(shiftright(xxhash64(t), bit) & 1)) * 2 > size(tk))
          |""".stripMargin).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    val ids = sims.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      h = sims(a).zip(sims(b)).count { case (x, y) => x != y }
      if h <= 3
    } yield ((a, b), h)).toMap
    assert(blocked == brute)
    // and the driver-facing gate row reports the same equivalence
    val gate = DedupOps.queries("q47_simhash")(spark, sfDir).head()
    assert(gate.getBoolean(0) && gate.getLong(1) == 0L
      && gate.getLong(2) == 0L)
  }

  test("salted hot-bucket self-join is exact under adversarial skew") {
    // one massively hot band bucket (every doc shares it) + normal
    // buckets: the salted path must produce exactly the plain
    // self-join's pairs
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) 0L else i))
      .toDF("doc_id", "bkey").withColumn("band", lit(0))
    val plain = rows.as("x").join(rows.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = DedupOps.bucketPairs(rows, Seq("band", "bkey"),
        hotThreshold = 8, salts = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain && plain.size == 100 * 99 / 2)
  }

  test("strong-jaccard pairs have much lower simhash hamming than random") {
    // Unigram simhash over a ~40-word vocab has thin majority margins,
    // so an absolute hamming cut is noisy; the robust property is that
    // near-dup pairs sit far below the random-pair hamming distribution.
    import org.apache.spark.sql.functions._
    val sims = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_distinct(TextOps.tokens(col("text"))).as("tk"))
      .select(col("doc_id"), expr(
        """transform(sequence(0, 63), bit ->
          |  aggregate(tk, 0, (acc, t) ->
          |    acc + int(shiftright(xxhash64(t), bit) & 1)) * 2 > size(tk))
          |""".stripMargin).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    def ham(a: Long, b: Long): Int =
      sims(a).zip(sims(b)).count { case (x, y) => x != y }
    val strong = DedupOps.queries("q45_ngram_jaccard")(spark, sfDir)
      .filter("jaccard >= 0.9").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(strong.nonEmpty)
    val strongMean = strong.map { case (a, b) => ham(a, b) }.sum.toDouble /
      strong.length
    val ids = sims.keys.toSeq.sorted
    val rnd = new scala.util.Random(1)
    val randMean = (1 to 500).map { _ =>
      val a = ids(rnd.nextInt(ids.length)); val b = ids(rnd.nextInt(ids.length))
      ham(a, b)
    }.sum / 500.0
    assert(strongMean < randMean * 0.5,
      s"strongMean=$strongMean randMean=$randMean")
  }

  test("ann lsh recall >= 0.6 vs exact top-10 cosine") {
    val got = VectorOps.annLshTopK(spark, sfDir, 10)
      .collect().map(_.getLong(0)).toSet
    import org.apache.spark.sql.functions._
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") === 0).select("v").head().getSeq[Double](0)
    val exact = e.withColumn("c",
        graft.functions.VectorFunctions.cosineSimilarity(col("v"),
          graft.functions.VectorFunctions.vecLit(q)))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = got.intersect(exact).size / 10.0
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("exact dedup groups partition the table") {
    val total = Tables.load(spark, sfDir, "documents").count()
    val r = DedupOps.queries("q44_dedup_exact")(spark, sfDir).collect()
    val sum = r.map(row => row.getLong(0) * row.getLong(1)).sum
    assert(sum == total) // sum over (copies * groups) == row count
  }

  test("incremental dedup: exact_dup / near_dup / kept all decided correctly") {
    import spark.implicits._
    // corpus doc 1; batch: 10 = verbatim copy (exact), 20 = one token
    // changed out of many (near, J >= 0.8), 30 = unrelated (kept),
    // 40 = same words re-ordered (NOT exact; shingle jaccard low -> kept)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearTxt = ((1 to 29).map(i => s"w$i") :+ "zz").mkString(" ")
    val reordered = (1 to 30).map(i => s"w${31 - i}").mkString(" ")
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq((10L, base), (20L, nearTxt),
      (30L, "totally different words here entirely now"),
      (40L, reordered)).toDF("doc_id", "text")
    val got = DedupOps.incrementalDedup(batch, corpus)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "exact_dup", 20L -> "near_dup",
      30L -> "kept", 40L -> "kept"))
  }

  test("CC fixpoint converges on CHAIN graphs (diameter > 1, multi-round path)") {
    import spark.implicits._
    // a 6-node path 1-2-3-4-5-6 plus an isolated pair 10-11: HashMin
    // needs ~log(diameter) propagation rounds (the corpus's cliques
    // converge at init and never exercise the loop)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("a_id", "b_id")
    val got = DedupOps.ccLabels(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (1L to 6L).map(_ -> 1L).toMap ++ Map(10L -> 10L, 11L -> 10L)
    assert(got == want)
  }

  test("q89 persisted LSH index probe: bucketed scan unexchanged, pairs == q88 near set") {
    val probe = DedupOps.queries("q89_lsh_index_probe")(spark, sfDir)
    val pairs = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the probed near-dup batch ids must equal q88's near_dup verdicts
    // (no exact dups exist in this corpus, so near == flagged)
    val q88Near = DedupOps.queries("q88_incremental_dedup")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("status") =!= "kept")
      .collect().map(_.getLong(0)).toSet
    assert(pairs.map(_._1) == q88Near)
    // the candidate join reads the persisted band index CO-PARTITIONED:
    // every Exchange in the probe plan is on the batch side (tiny);
    // the bucketed corpus scan reports its bucketing instead
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan)
  }

  test("q184 substring spans: maximal runs, gap breaks, hot-gram cap") {
    import spark.implicits._
    def doc(id: Long, words: String*) = (id, words.mkString(" "))
    val shared = (1 to 10).map(i => s"w$i") // a 10-token shared span
    val docs = Seq(
      doc(1L, ("a1" +: "a2" +: shared :+ "a3"): _*),
      doc(2L, ("b1" +: shared) ++ Seq("b2", "b3"): _*),
      // doc 3 shares TWO runs with doc 1, split by a mismatch token:
      // w1..w5 and w7..w10 — the gap must break the island
      doc(3L, (shared.take(5) ++ Seq("zz") ++ shared.drop(6)): _*)
    ).toDF("doc_id", "text")
    val spans = DedupOps.substringSpans(docs, cap = 50)
      .collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        r.getAs[Long]("span_len")))
    // pair (1,2): exactly ONE maximal span of exactly 10 tokens — the
    // 7 overlapping gram matches must merge, not count separately
    val p12 = spans.filter(_._1 == (1L, 2L)).map(_._2)
    assert(p12.toSeq == Seq(10L), s"want one 10-token span, got ${p12.toSeq}")
    // pair (1,3): the mismatch splits it — spans of 5 and 4 tokens
    val p13 = spans.filter(_._1 == (1L, 3L)).map(_._2).sorted
    assert(p13.toSeq == Seq(4L, 5L), s"gap must break the run: ${p13.toSeq}")
    // hot-gram cap: with cap=0 every gram is boilerplate -> no spans
    assert(DedupOps.substringSpans(docs, cap = 0).count() == 0)
  }

  test("q185 dup-token union: both pair sides counted, overlaps once") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"w$i")
    val docs = Seq(
      (1L, ("a1" +: "a2" +: shared :+ "a3").mkString(" ")),
      (2L, (("b1" +: shared) ++ Seq("b2", "b3")).mkString(" ")),
      // doc 4 shares w3..w10 with docs 1 and 2 — inside the w1..w10
      // interval those docs already carry, so their union must NOT grow
      (4L, (shared.drop(2) ++ Seq("x", "y", "z")).mkString(" "))
    ).toDF("doc_id", "text")
    val dup = DedupOps.dupTokensPerDoc(docs, cap = 50, minSpan = 8)
      .collect().map(r => r.getAs[Long]("doc_id")
        -> r.getAs[Long]("dup_tokens")).toMap
    // docs 1 and 2: the 10-token w-span (vs each other) overlapping
    // the 8-token w3..w10 span (vs doc 4) -> union exactly 10
    assert(dup(1L) == 10L, s"overlap must count once: ${dup(1L)}")
    assert(dup(2L) == 10L, s"overlap must count once: ${dup(2L)}")
    // doc 4: w3..w10 = 8 tokens, claimed by BOTH pair sides + both
    // partners, still one interval
    assert(dup(4L) == 8L, s"doc 4 union: ${dup(4L)}")
  }

  test("q127 containment == local brute-force over shingle sets") {
    import org.apache.spark.sql.functions._
    val got = DedupOps.queries("q127_containment")(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // independent local recompute (500 docs at sf0.001)
    val sets = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), lower(trim(col("text"))).as("t")).collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+")
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      c = (sa & sb).size.toDouble / sa.size if c >= 0.9
    } yield (a, b) -> (math.rint(c * 1e6) / 1e6)).toMap
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"$k")
  }

  test("q239 source matrix: cells partition the q45 pair set") {
    import org.apache.spark.sql.functions._
    val rows = DedupOps.queries("q239_dup_source_matrix")(spark, sfDir)
      .collect()
    val nPairs = DedupOps.queries("q45_ngram_jaccard")(spark, sfDir)
      .count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == nPairs,
      "matrix cells must partition the exact pair set")
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[String]("src_lo"), r.getAs[String]("src_hi"))
      assert(lo <= hi, r.toString)
      assert(r.getAs[Boolean]("cross_source") == (lo != hi), r.toString)
    }
  }

  test("q254 edit-distance dedup: metric pins and blocking behavior") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, base),
      (1L, base.replace("gamma", "gamba")), // 1-char substitution
      (2L, base.replace("beta gamma", "gamma beta")), // token reorder
      (3L, "totally different words nothing shared here at all")
    ).toDF("doc_id", "text")
    val got = DedupOps.editDistanceDedup(docs, maxDist = 30).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        r.getAs[Int]("edit_dist")).toMap
    // (0,1): one substituted character
    assert(got((0L, 1L)) == 1)
    // (0,2): swapping adjacent tokens costs edits on both words;
    // levenshtein("beta gamma", "gamma beta") = 8 embedded in context
    assert(got.contains((0L, 2L)) && got((0L, 2L)) > 1
      && got((0L, 2L)) <= 10)
    // (1,2) still share 4-grams via the unchanged tail -> candidate,
    // and within threshold
    assert(got.contains((1L, 2L)))
    // doc 3 shares no 4-gram with anything: never a candidate
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("q254 edit-distance dedup: threshold excludes far pairs that " +
      "share a gram") {
    import spark.implicits._
    // shared 4-gram head, then >30 edits of divergence
    val head = "one two three four"
    val docs = Seq(
      (0L, head + " aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (1L, head + " bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb")
    ).toDF("doc_id", "text")
    // candidates (shared head) but 40 substitutions > 30: filtered
    assert(DedupOps.editDistanceDedup(docs, maxDist = 30).count() == 0)
    assert(DedupOps.editDistanceDedup(docs, maxDist = 40).count() == 1)
  }

  test("q240 dedup yield: consistent with the cluster labels and bounded") {
    val r = DedupOps.queries("q240_dedup_yield")(spark, sfDir).head()
    val n = r.getAs[Long]("n_docs")
    val rem = r.getAs[Long]("docs_removed")
    val cl = r.getAs[Long]("n_dup_clusters")
    assert(n > 0 && rem >= cl, // every cluster removes >= 1 member
      r.toString)
    assert(r.getAs[Long]("tokens_saved") <= r.getAs[Long]("tokens_total"))
    val pd = r.getAs[Double]("pct_docs_removed")
    assert(pd >= 0.0 && pd < 1.0, r.toString)
  }

  test("q275 split leakage: cells PARTITION the q45 pair set") {
    val nPairs = operators.DedupOps
      .queries("q45_ngram_jaccard")(spark, sfDir).count()
    val cells = operators.DedupOps
      .queries("q275_split_leakage")(spark, sfDir).collect()
    assert(cells.nonEmpty)
    assert(cells.map(_.getAs[Long]("n_pairs")).sum == nPairs,
      "leakage cells must tile the near-dup pair set exactly")
    cells.foreach { c =>
      assert(c.getAs[Boolean]("leaky") ==
        (c.getAs[String]("split_lo") != c.getAs[String]("split_hi")))
    }
  }
}
