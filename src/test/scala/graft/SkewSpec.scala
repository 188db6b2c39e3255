package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Salting must be a pure physical transformation: identical results,
  * better distribution. */
class SkewSpec extends SparkSpecBase {

  test("salted inner join == plain inner join on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = spark.range(20000).selectExpr(
      "CASE WHEN id % 10 < 9 THEN 7 ELSE CAST(id % 100 AS BIGINT) END AS k",
      "id AS payload")
    val right = spark.range(100).selectExpr("id AS k", "id * 2 AS rv")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "payload", "rv").collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedInnerJoin(left, right, "k", buckets = 8)
      .select("k", "payload", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("salted agg == plain agg on skewed keys") {
    val df = spark.range(50000).selectExpr(
      "CASE WHEN id % 20 < 19 THEN 3 ELSE CAST(id % 50 AS BIGINT) END AS k",
      "CAST(id AS DOUBLE) AS v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2)))).toSet
    val salted = SkewOps.saltedAgg(df, "k", salts = 16,
      aggs = Seq(count(lit(1)).as("n"), sum("v").as("s")),
      merge = Seq(sum("n").as("n"), sum("s").as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2)))).toSet
    assert(salted == plain)
  }

  test("salt actually distributes the hot key across buckets") {
    val left = spark.range(10000).selectExpr("7 AS k", "id AS payload")
    import graft.operators.SkewOps
    val salts = left.withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length == 8) // every bucket hit
    assert(salts.map(_.getLong(1)).max < 10000 * 0.3) // no bucket dominates
  }
}
