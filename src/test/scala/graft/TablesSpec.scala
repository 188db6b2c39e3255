package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Contract test for the events.ts schema normalization. The driver has
  * shipped events.parquet with two different physical ts types across
  * rounds — TIMESTAMP(NANOS) (Spark reads a raw nanos Long under
  * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS,
  * utc=false) (Spark reads TIMESTAMP_NTZ). Round 5 broke two streaming
  * gates because call sites hand-rolled the conversion for only one
  * variant. This spec pins [[Tables.fixEventTs]] on BOTH variants with
  * in-test fixtures, so a third driver flip (or a new call site
  * bypassing fixEventTs) fails here before it can reach the gates.
  */
class TablesSpec extends SparkSpecBase {

  private val micros = Seq(0L, 1700000000123456L, 1700003600000000L)

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events_schema").toString
    // variant A: raw nanos Long, as the nanosAsLong read of the
    // driver's TIMESTAMP(NANOS) file presents it
    micros.map(_ * 1000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/nanos")
    // variant B: TIMESTAMP_NTZ micros (isAdjustedToUTC=false)
    micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    dir
  }

  test("fixEventTs: raw nanos Long -> TIMESTAMP with exact micros") {
    import spark.implicits._
    val df = spark.read.parquet(s"$fixtureDir/nanos")
    assert(df.schema("ts").dataType.typeName == "long") // fixture sanity
    val fixed = Tables.fixEventTs(df)
    assert(fixed.schema("ts").dataType == TimestampType)
    assert(fixed.select(unix_micros(col("ts"))).as[Long].collect().sorted
      .toSeq == micros.sorted)
  }

  test("fixEventTs: TIMESTAMP_NTZ -> TIMESTAMP with exact micros (UTC)") {
    import spark.implicits._
    val df = spark.read.parquet(s"$fixtureDir/ntz")
    assert(df.schema("ts").dataType == TimestampNTZType) // fixture sanity
    val fixed = Tables.fixEventTs(df)
    assert(fixed.schema("ts").dataType == TimestampType)
    assert(fixed.select(unix_micros(col("ts"))).as[Long].collect().sorted
      .toSeq == micros.sorted)
  }

  test("fixEventTs: both variants normalize to identical rows") {
    val a = Tables.fixEventTs(spark.read.parquet(s"$fixtureDir/nanos"))
    val b = Tables.fixEventTs(spark.read.parquet(s"$fixtureDir/ntz"))
    assert(a.schema == b.schema)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("fixEventTs: already-TIMESTAMP ts and ts-less frames untouched") {
    import spark.implicits._
    val tsed = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.fixEventTs(tsed).schema("ts").dataType == TimestampType)
    assert(Tables.fixEventTs(tsed).exceptAll(tsed).isEmpty)
    val noTs = Seq((1L, "a")).toDF("id", "s")
    assert(Tables.fixEventTs(noTs).schema == noTs.schema)
  }

  test("the real events table loads as TIMESTAMP whatever the driver shipped") {
    val ev = Tables.load(spark, sfDir, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
  }
}
