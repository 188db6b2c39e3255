package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small file/dir helpers shared across the engine — one
  * implementation for the recursive-delete and read-small-file idioms
  * that otherwise get hand-rolled per call site. */
object Util {

  /** Recursively delete a local file/directory tree (does not follow
    * symlinks — File.delete removes the link itself). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Read a small text file through the Hadoop filesystem API (works
    * against HDFS/object stores, not just local disk). */
  def readSmallFile(s: SparkSession, path: org.apache.hadoop.fs.Path): String = {
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Parallelism decoupling for per-row CPU kernels (guide §2.5
    * "input skew" / §6 unsplittable input): a single-row-group parquet
    * file arrives as ONE split — Spark cannot subdivide a row group —
    * so a narrow pipeline over it runs on one core no matter the
    * master. Repartition to defaultParallelism ONLY when the input has
    * fewer partitions; at production split counts the branch never
    * fires and pipelines stay shuffle-free. Call on narrow (scan +
    * project/filter) inputs only — `.rdd.getNumPartitions` on a
    * post-shuffle AQE plan would trigger partial execution. */
  def spreadInput(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Run independent Spark job CHAINS concurrently from a small
    * driver pool (guide §2.6 "overlap independent jobs"): actions are
    * only sequential because driver code calls them sequentially, so
    * the tail of one chain's stages backfills executors the others
    * freed. Results return in `bodies` order. The caller's job group /
    * description / interrupt flag (thread-local) are re-installed in
    * every pool thread so a surrounding cancelJobGroup
    * (Bench.runCapped's cap) still kills all of them. Failures
    * rethrow the original exception — fail-loud order preserved. */
  def inParallel[A](s: SparkSession, bodies: Seq[() => A]): Seq[A] = {
    val sc = s.sparkContext
    val props = Seq("spark.jobGroup.id", "spark.job.description",
      "spark.job.interruptOnCancel")
      .map(k => k -> sc.getLocalProperty(k))
    val pool =
      java.util.concurrent.Executors.newFixedThreadPool(bodies.size)
    try {
      val futs = bodies.map { b =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = {
            props.foreach { case (k, v) =>
              if (v != null) sc.setLocalProperty(k, v)
            }
            b()
          }
        })
      }
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdown()
  }

  /** Write a small text file through the Hadoop filesystem API,
    * overwriting any existing file. */
  def writeSmallFile(s: SparkSession, path: org.apache.hadoop.fs.Path,
      content: String): Unit = {
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
