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
}
