package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility (guide §1: measure first): run SparkEntry queries one at
  * a time and print a per-stage breakdown — task count, wall, summed
  * executor run time — so single-task serialization bottlenecks and
  * 32-task overhead-only stages are visible without the UI.
  * Args: sfDir name [name...]. Env PROF_REPEAT (default 1). */
object ProfOne {
  private final case class StageRow(id: Int, name: String, tasks: Int,
    wallMs: Long, runMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val repeat = sys.env.getOrElse("PROF_REPEAT", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // extra confs for A/B experiments: PROF_CONFS="k=v;k=v"
    val extra = sys.env.getOrElse("PROF_CONFS", "").split(';')
      .map(_.trim).filter(_.contains('='))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(s: SparkListenerStageCompleted)
          : Unit = {
        val si = s.stageInfo
        val wall = (for {
          sub <- si.submissionTime; done <- si.completionTime
        } yield done - sub).getOrElse(0L)
        stages.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, wall, si.taskMetrics.executorRunTime))
      }
    })

    // same JVM warmup as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()

    names.foreach { n =>
      (1 to repeat).foreach { it =>
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        stages.clear(); jobs = 0
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; a short sleep is
        // enough at this event volume (dev-only utility)
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val rows = stages.asScala.toSeq.sortBy(-_.wallMs)
        val sumWall = rows.map(_.wallMs).sum / 1000.0
        println(f"[prof] $n%-26s it=$it ${sec}%7.2fs rows=$cnt " +
          f"jobs=$jobs stages=${rows.size} stageWallSum=$sumWall%6.2fs")
        rows.take(12).foreach { r =>
          println(f"  stage ${r.id}%4d tasks=${r.tasks}%3d " +
            f"wall=${r.wallMs / 1000.0}%7.3fs run=${r.runMs / 1000.0}%7.3fs  ${r.name.take(70)}")
        }
      }
    }
    spark.stop()
  }
}
