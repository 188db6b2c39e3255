package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries at a given sf. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[time] $n%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$cnt")
    }
    spark.stop()
  }
}
