package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans + exchange/codegen
  * counts for the query suite — the ".explain and iterate" loop. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).size
        val codegen = "WholeStageCodegen".r.findAllIn(plan).size +
          "\\*\\(".r.findAllIn(plan).size
        val bnlj = if (plan.contains("BroadcastNestedLoop")) " BNLJ" else ""
        val cartesian = if (plan.contains("Cartesian")) " CARTESIAN" else ""
        val sortAgg = if (plan.contains("SortAggregate")) " SORTAGG" else ""
        println(f"[plan] $n%-24s exchanges=$exchanges%2d codegenSpans=$codegen%2d$bnlj$cartesian$sortAgg")
      } catch { case e: Throwable =>
        println(s"[plan] $n ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
