package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table loading helpers over the driver-generated parquet test tables
  * (see TESTDATA.md). Mirrors the reference's catalog lookup
  * (reference: src/include/catalog/catalog.h:58-118) — in Spark the
  * "catalog" is just parquet paths; Catalyst handles pushdown/pruning.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark rejects
      // ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos and convert.
      // Integer `DIV` keeps full precision (double division would lose
      // bits at 1.7e18 ns epochs).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Per-sfDir scratch root for layout rewrites (bucketed tables,
    * partitioned copies, persisted indexes). Under java.io.tmpdir like
    * the streaming checkpoints; keyed by the source dir so sf0.001
    * specs, sf0.01 verify and the bench's two scale points never
    * collide. */
  def scratchDir(sfDir: String): String =
    sys.props("java.io.tmpdir") + "/graft-layout-" +
      java.lang.Integer.toHexString(sfDir.hashCode)

  /** Catalog-safe suffix for per-sfDir table names. */
  def dirKey(sfDir: String): String =
    java.lang.Integer.toHexString(sfDir.hashCode)

  /** Register every table as a temp view so spark.sql(...) works on the
    * same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
