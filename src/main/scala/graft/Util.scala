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

  /** Write a small text file through the Hadoop filesystem API,
    * overwriting any existing file. */
  def writeSmallFile(s: SparkSession, path: org.apache.hadoop.fs.Path,
      content: String): Unit = {
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
