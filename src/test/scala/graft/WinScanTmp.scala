package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object WinScanTmp extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val d = "/root/testdata/sf0.001"
  def scan(p: SparkPlan): Seq[WindowExec] = {
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case _ => Seq.empty
    }
    val kids = p.children ++ p.subqueries ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    })
    self ++ kids.flatMap(scan)
  }
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    try {
      val plan = fn(spark, d).queryExecution.executedPlan
      val bad = scan(plan)
      if (bad.nonEmpty) println(s"UNPARTITIONED_WINDOW $name (${bad.size})")
    } catch { case e: Throwable =>
      println(s"SKIP $name: ${e.getClass.getSimpleName}")
    }
  }
  println("WINSCAN_DONE")
  spark.stop()
}
