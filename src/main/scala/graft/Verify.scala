package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** One query's dump: parquet on success; on ANY failure a marker
    * dir containing `_ERROR` (and no parquet) so the driver's compare
    * records a crash row instead of silently shrinking the
    * denominator — the r5 silent-failure mode. Split out of main()
    * so VerifySpec can exercise the marker plumbing directly.
    * Returns true on success. */
  private[graft] def runOne(spark: SparkSession, sfDir: String,
      outDir: String, name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : Boolean = {
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      true
    } catch { case e: Throwable =>
      System.err.println(s"[verify] $name failed: ${e.getMessage}")
      try {
        val d = new java.io.File(s"$outDir/$name")
        Util.deleteRecursively(d) // clear partial writes too
        d.mkdirs()
        Files.writeString(Paths.get(s"$outDir/$name/_ERROR"),
          s"${e.getClass.getName}: ${e.getMessage}")
      } catch { case _: Throwable => () }
      false
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // substring filter for fast single-query iteration (same contract
    // as Bench's SPARK_GRAFT_BENCH_FILTER); the driver sets nothing
    // and gets every query
    val filter = sys.env.get("SPARK_GRAFT_VERIFY_FILTER")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.exists(n.contains)) }
      .foreach { case (name, fn) =>
      // hermetic per query: queries cache freely (dedup/index
      // pipelines) and nothing unpersists across 60+ of them
      spark.catalog.clearCache()
      runOne(spark, sfDir, outDir, name, fn): Unit
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
