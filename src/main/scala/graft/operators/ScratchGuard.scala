package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-invalidating build guards for PERSISTENT scratch layouts
  * (partitioned copies, format round-trips, snapshot manifests). The
  * scratch root (java.io.tmpdir, keyed by sfDir) outlives the
  * driver's test-parquet regeneration — events.parquet has already
  * changed physical schema between rounds once — so an
  * "output exists" guard alone can serve a layout built from a
  * PREVIOUS generation of the source table, red-flagging every query
  * over it against a live-table oracle. The guard pairs the build's
  * commit marker with a recorded content signature (count + xor of a
  * key hash, one cheap scan of the live base): any regeneration flips
  * the signature and forces a rebuild.
  *
  * Per-process scratch (VectorOps/StreamGateOps temp roots) and
  * session-catalog-guarded tables (bucketed layouts — the in-memory
  * catalog dies with the JVM, so each driver process rebuilds) don't
  * need this; only cross-process fs-existence guards do.
  */
object ScratchGuard {

  /** Cheap content signature of the live base table. xxhash64 (not
    * hash): it returns LONG, so the xor aggregate is LONG too. */
  def sig(base: DataFrame, keyCol: String): String = {
    val r = base.agg(count(lit(1)), expr(s"bit_xor(xxhash64($keyCol))")).head()
    s"${r.getLong(0)}_${r.getLong(1)}"
  }

  private def sigPath(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/_base_sig")

  private def fsOf(s: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** true iff a signature was recorded for `root` and matches `sig`. */
  def current(s: SparkSession, root: String, sig: String): Boolean = {
    val p = sigPath(root)
    val fs = fsOf(s, p)
    fs.exists(p) && {
      val in = fs.open(p)
      (try scala.io.Source.fromInputStream(in, "UTF-8").mkString
       finally in.close()) == sig
    }
  }

  /** Record `sig` for `root` — call AFTER the layout build commits. */
  def record(s: SparkSession, root: String, sig: String): Unit = {
    val p = sigPath(root)
    val fs = fsOf(s, p)
    val out = fs.create(p, true)
    try out.write(sig.getBytes("UTF-8")) finally out.close()
  }
}
