package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The judge-proofing path of the correctness dump: a crashing query
  * must leave an `_ERROR` marker dir (no parquet) so tools/check.py —
  * and the driver's compare — records a CRASH row instead of silently
  * shrinking the denominator (the failure mode that hid the r5
  * regression). Without this spec, a regression in the marker plumbing
  * would go unnoticed exactly when it matters. */
class VerifySpec extends SparkSpecBase {

  private def tmpOut(): String =
    Files.createTempDirectory("graft_verify_spec").toString

  test("a throwing query leaves an _ERROR marker with the exception") {
    val out = tmpOut()
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberate-crash-for-spec")
    val ok = Verify.runOne(spark, sfDir, out, "qx_crash", boom)
    assert(!ok)
    val marker = Paths.get(s"$out/qx_crash/_ERROR")
    assert(Files.exists(marker), "_ERROR marker must land")
    val msg = Files.readString(marker)
    assert(msg.contains("IllegalStateException")
      && msg.contains("deliberate-crash-for-spec"))
    // no parquet alongside the marker — check.py keys CRASH on the
    // marker and MISS on absent parquet; both must agree it failed
    val files = new java.io.File(s"$out/qx_crash").listFiles().map(_.getName)
    assert(!files.exists(_.endsWith(".parquet")))
  }

  test("a failing query CLEARS a previous success's parquet (no stale " +
      "result can pass the gate)") {
    val out = tmpOut()
    import spark.implicits._
    val good: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq((1, "a")).toDF("k", "v") }
    assert(Verify.runOne(spark, sfDir, out, "qx_flip", good))
    assert(new java.io.File(s"$out/qx_flip").listFiles()
      .exists(_.getName.endsWith(".parquet")))
    // a DataFrame whose EXECUTION throws (build-time succeeds): the
    // common crash shape — analysis passes, an executor task throws
    val lateBoom: (SparkSession, String) => DataFrame =
      (s, _) => {
        import s.implicits._
        Seq(1, 0).toDF("d").selectExpr("assert_true(d > 0)", "d")
      }
    assert(!Verify.runOne(spark, sfDir, out, "qx_flip", lateBoom))
    val files = new java.io.File(s"$out/qx_flip").listFiles().map(_.getName)
    assert(files.contains("_ERROR"))
    assert(!files.exists(_.endsWith(".parquet")),
      "stale parquet from the earlier success must be cleared")
  }

  test("a successful query writes parquet and no marker") {
    val out = tmpOut()
    val good: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq((1L, 2.0)).toDF("a", "b") }
    assert(Verify.runOne(spark, sfDir, out, "qx_ok", good))
    val files = new java.io.File(s"$out/qx_ok").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".parquet")))
    assert(!files.contains("_ERROR"))
  }
}
