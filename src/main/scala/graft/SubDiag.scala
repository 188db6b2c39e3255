package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run ONE substring-dedup scale point in isolation
  * (r9 verdict item 1 — pin whether the 1M reading of 184.8s was
  * host contention or a real cliff). Args: [n] (default 1000000). */
object SubDiag {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same JVM warmup as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    val p = TextScaleBench.runSubstringPoint(spark, n)
    println(s"[subdiag] n=$n first=${p.subFirst} ${p.json}")
    spark.stop()
  }
}
