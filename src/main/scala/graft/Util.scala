package graft

import org.apache.spark.sql.SparkSession

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

  /** Write a small text file through the Hadoop filesystem API,
    * overwriting any existing file. */
  def writeSmallFile(s: SparkSession, path: org.apache.hadoop.fs.Path,
      content: String): Unit = {
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
}
