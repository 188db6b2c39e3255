package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage-profiler for the similarity-join family (round-2
  * perf work). Not part of the driver contract. */
object Prof {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.{DedupOps, TextOps}

    // stage 1: tokens + posexplode only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "t")))
    time("posexplode tokens count")(toks.count())

    val sh = toks
      .withColumn("t2", lead("t", 1).over(w))
      .withColumn("t3", lead("t", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy("doc_id")
      .agg(collect_set(concat_ws(" ", col("t"), col("t2"), col("t3")))
        .as("sh"))
    time("docShingles count")(sh.count())

    val inv = sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))
    time("postings count")(inv.count())

    val invC = inv.cache()
    time("postings cache materialize")(invC.count())

    val a = invC.as("a"); val b = invC.as("b")
    val joined = a.join(b, col("a.shingle") === col("b.shingle")
      && col("a.doc_id") < col("b.doc_id"))
    time("self-join pair count")(joined.count())

    val agg = joined
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double")
        / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.8)
    time("full q45 tail")(agg.count())
    invC.unpersist()

    time("q45 end-to-end")(
      DedupOps.queries("q45_ngram_jaccard")(spark, dir).count())
    time("q45 again (warm)")(
      DedupOps.queries("q45_ngram_jaccard")(spark, dir).count())
    time("q56 end-to-end")(
      DedupOps.queries("q56_jaccard_ppjoin")(spark, dir).count())
    spark.catalog.clearCache()
    time("q56 warm")(
      DedupOps.queries("q56_jaccard_ppjoin")(spark, dir).count())
    time("q47 end-to-end")(
      DedupOps.queries("q47_simhash")(spark, dir).count())
    spark.catalog.clearCache()
    time("q47 warm")(
      DedupOps.queries("q47_simhash")(spark, dir).count())
    spark.catalog.clearCache()
    time("q45 hermetic-warm")(
      DedupOps.queries("q45_ngram_jaccard")(spark, dir).count())
    spark.catalog.clearCache()
    time("q46 warm")(
      DedupOps.queries("q46_minhash_lsh")(spark, dir).count())
    spark.catalog.clearCache()
    time("q49 cold")(
      DedupOps.queries("q49_embed_dup_ivf")(spark, dir).count())
    spark.catalog.clearCache()
    time("q49 warm")(
      DedupOps.queries("q49_embed_dup_ivf")(spark, dir).count())
    spark.stop()
  }
}
