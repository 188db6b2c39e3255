package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
      // The driver has generated events.ts as parquet TIMESTAMP(NANOS)
      // in some rounds (Spark rejects it, [PARQUET_TYPE_ILLEGAL],
      // unless read as raw nanos) and TIMESTAMP(MICROS, utc=false) in
      // others (Spark reads TIMESTAMP_NTZ). Normalize either to a
      // session-tz TIMESTAMP so every downstream unix_micros/window
      // sees one type; fixEventTs handles both.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      fixEventTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize the events.ts column to TimestampType regardless of how
    * the parquet declared it: raw nanos Long (integer `DIV` keeps full
    * precision — double division loses bits at 1.7e18 ns epochs), or
    * TIMESTAMP_NTZ (cast re-tags the same micros under the UTC session
    * tz — Verify/Bench/specs all pin spark.sql.session.timeZone=UTC so
    * the wall-clock reading matches DuckDB's naive timestamps). */
  def fixEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
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
