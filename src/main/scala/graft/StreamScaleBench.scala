package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.streaming.StreamOps

/** The streaming twin of [[VectorScaleBench]]/[[TextScaleBench]]/
  * [[GraphScaleBench]]: the three canonical STATEFUL streaming shapes
  * executed as REAL Structured Streaming queries (file source →
  * time-sliced micro-batches under `maxFilesPerTrigger=1` → parquet
  * sink) on generated corpora at 200k and 1M events — far beyond the
  * driver tables — with PLANTED ground truth so every number is
  * checked, not just timed:
  *
  *  - sessionization (`flatMapGroupsWithState`): every user gets
  *    exactly 10 sessions of 10 events (1 min apart inside a session,
  *    2 h between sessions), so session count, per-session event
  *    count, per-session span (exactly 9 min) and total value mass
  *    are all closed-form. The far-future sentinel file (`zz_` so the
  *    path-ordered source reads it LAST) advances the watermark and
  *    flushes every live session — the same two-watermark mechanics
  *    the q122 gate pins.
  *  - watermarked exact dedup (`dropDuplicatesWithinWatermark`):
  *    every document is planted exactly twice at the SAME event time
  *    (so the pair always falls inside the watermark window) —
  *    survivors are exactly n/2, no slack.
  *  - watermarked tumbling-window aggregation: one event per second,
  *    types cycling mod 4, base hour-aligned — every full hour holds
  *    exactly 900 events per type, and total window mass equals the
  *    event count.
  *
  * State per query is the shape that scales: one live-session record
  * per user, one fingerprint per watermark window, one row per
  * (window × type) — never proportional to throughput. Only O(1)
  * check scalars are collected.
  */
object StreamScaleBench {

  /** Hour-aligned epoch base (1699999200000 = 2023-11-14 22:00:00 UTC)
    * — alignment makes the tumbling-window census closed-form. */
  val BaseMs: Long = 1699999200000L

  private def timeIt[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def r3(v: Double): Double = math.rint(v * 1000) / 1000

  private lazy val scratchRoot: java.io.File = {
    val f = java.nio.file.Files
      .createTempDirectory("graft_stream_scale_").toFile
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => Util.deleteRecursively(f)))
    f
  }

  /** Write `df` into `dir/src` as `parts` time-sliced parquet files
    * named in slab order (`b_000.parquet` …) — the file source then
    * replays arrival in event-time order, one slab per micro-batch.
    *
    * CRITICAL: the file source orders unread files by MODIFICATION
    * TIME, and the parallel write stamps part files in task-COMPLETION
    * order — effectively random across slabs. A mid-order slab read
    * last lands wholly below the watermark and is silently dropped
    * (observed: an entire planted session vanishing at n=2k). So the
    * mtimes are re-stamped strictly increasing in slab order; the
    * path name is then only documentation. */
  private[graft] def writeSrc(df: DataFrame, dir: java.io.File,
      parts: Int, byCol: String = "ts"): String = {
    val stage = new java.io.File(dir, "stage")
    df.repartitionByRange(parts, col(byCol))
      .write.mode("overwrite").parquet(stage.getAbsolutePath)
    val src = new java.io.File(dir, "src"); src.mkdirs()
    val t0 = System.currentTimeMillis()
    stage.listFiles().filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName).zipWithIndex.foreach { case (f, i) =>
        val dst = new java.io.File(src, f"b_$i%03d.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath)
        dst.setLastModified(t0 + i * 2000L)
      }
    Util.deleteRecursively(stage)
    src.getAbsolutePath
  }

  /** Append a single far-future row as `zz_sentinel.parquet` with an
    * mtime a day past every data slab (the source orders by mtime —
    * see [[writeSrc]]) — its event time drags the watermark past
    * every open window/session so append-mode state flushes. */
  private def addSentinel(s: SparkSession, srcDir: String,
      row: DataFrame): Unit = {
    val tmp = new java.io.File(srcDir).getParent + "/sentinel_build"
    row.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(srcDir, "zz_sentinel.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dst.setLastModified(System.currentTimeMillis() + 86400000L)
    Util.deleteRecursively(new java.io.File(tmp))
  }

  /** Run `build` over a file-source stream of `srcDir` (one file per
    * micro-batch) into a parquet sink; returns the sink read back. */
  private def runStream(s: SparkSession, srcDir: String,
      dir: java.io.File, schema: StructType,
      build: DataFrame => DataFrame): DataFrame = {
    val out = build(s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir))
    val q = out.writeStream.format("parquet")
      .option("path", dir.getAbsolutePath + "/out")
      .option("checkpointLocation", dir.getAbsolutePath + "/cp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.read.parquet(dir.getAbsolutePath + "/out")
  }

  private def fresh(name: String): java.io.File = {
    val d = new java.io.File(scratchRoot, name)
    Util.deleteRecursively(d); d.mkdirs(); d
  }

  // ---- planted corpora (pure functions of the row id) ----------------

  /** Session corpus: user = id/100; event k%100 sits in session
    * (k/10) at minute (k%10) — 10 sessions × 10 events per user,
    * sessions 2 h apart (> the 30-min gap), events 1 min apart. */
  private def sessionEvents(s: SparkSession, n: Long): DataFrame =
    s.range(n).selectExpr(
      "id AS event_id",
      s"timestamp_millis($BaseMs + (id % 100) DIV 10 * 7200000" +
        " + (id % 100) % 10 * 60000) AS ts",
      "id DIV 100 AS user_id",
      "'e' AS event_type",
      "CAST(1.0 AS DOUBLE) AS value")

  /** Dedup corpus: ids i and i + n/2 carry identical text at the SAME
    * event time — every fingerprint is planted exactly twice, always
    * inside the watermark window. */
  private def dupDocs(s: SparkSession, n: Long): DataFrame =
    s.range(n).selectExpr(
      "id AS doc_id",
      s"timestamp_millis($BaseMs + (id % ${n / 2}) * 10) AS ts",
      s"concat('doc ', CAST(id % ${n / 2} AS STRING)) AS text")

  /** Window corpus: one event per second from the hour-aligned base,
    * types cycling mod 4 — each full hour holds exactly 900 events of
    * each type. */
  private def secondEvents(s: SparkSession, n: Long): DataFrame =
    s.range(n).selectExpr(
      "id AS event_id",
      s"timestamp_millis($BaseMs + id * 1000) AS ts",
      "id DIV 100 AS user_id",
      "concat('t', CAST(id % 4 AS STRING)) AS event_type",
      "CAST(1.0 AS DOUBLE) AS value")

  final case class Point(n: Long, genSec: Double,
      sesSec: Double, sesOk: Boolean,
      dedupSec: Double, dedupOk: Boolean,
      winSec: Double, winOk: Boolean,
      parts: Int = 8,
      first: Option[Point] = None) {
    private def rps(sec: Double): Double =
      if (sec <= 0) 0.0 else math.rint(n / sec)
    def json: String =
      s"""{"n":$n,"parts":$parts,"gen_sec":${r3(genSec)},""" +
        s""""session_sec":${r3(sesSec)},"sessions_ok":$sesOk,""" +
        s""""session_rows_per_sec":${rps(sesSec)},""" +
        s""""dedup_sec":${r3(dedupSec)},"dedup_ok":$dedupOk,""" +
        s""""dedup_rows_per_sec":${rps(dedupSec)},""" +
        s""""window_sec":${r3(winSec)},"windows_ok":$winOk,""" +
        s""""window_rows_per_sec":${rps(winSec)}""" +
        first.map(f => s""","first_run":${f.json}""").getOrElse("") + "}"
    def allOk: Boolean = sesOk && dedupOk && winOk
  }

  /** Same noise-guard contract as the graph/text/vector harnesses:
    * best-of-2 per metric, invariant flags ANDed, the first run kept
    * in the artifact when any metric disagrees by > 1.3×. */
  private[graft] def merged(a: Point, b: Point): Point = {
    val m = Point(a.n, math.min(a.genSec, b.genSec),
      math.min(a.sesSec, b.sesSec), a.sesOk && b.sesOk,
      math.min(a.dedupSec, b.dedupSec), a.dedupOk && b.dedupOk,
      math.min(a.winSec, b.winSec), a.winOk && b.winOk, a.parts)
    val noisy = Seq((a.sesSec, m.sesSec), (a.dedupSec, m.dedupSec),
      (a.winSec, m.winSec))
      .exists { case (f, mn) => f > 1.3 * mn && f - mn > 0.5 }
    if (noisy) m.copy(first = Some(a)) else m
  }

  final case class Result(points: Seq[Point]) {
    def json: String =
      s"""{"points":[${points.map(_.json).mkString(",")}]}"""
    def summary: Option[String] = points.lastOption.map { p =>
      s"""{"n_max":${p.n},"session_sec":${r3(p.sesSec)},""" +
        s""""session_rows_per_sec":${
          if (p.sesSec <= 0) 0.0 else math.rint(p.n / p.sesSec)},""" +
        s""""all_ok":${p.allOk}}"""
    }
  }

  def runPoint(spark: SparkSession, n: Long, attempt: Int): Point = {
    import spark.implicits._
    require(n >= 200 && n % 200 == 0, s"n=$n must be a multiple of 200")
    val users = n / 100
    // micro-batch count scales WITH n (rows per file held ~constant
    // at ≤31.25k), so wall time tracks per-batch state work at a
    // fixed arrival granularity and rows/sec is comparable across
    // points — a FIXED file count made every corpus 9 micro-batches
    // and the wall time a flat trigger-overhead constant (r8: 10.85 s
    // at 200k vs 10.64 s at 1M — not evidence of anything)
    val parts = math.max(8, (n / 31250L).toInt)

    // -- sessionization --------------------------------------------
    val sesDir = fresh(s"ses_${n}_$attempt")
    val (sesSchema, genSec1) = timeIt {
      val src = writeSrc(sessionEvents(spark, n), sesDir, parts)
      addSentinel(spark, src, spark.range(1).selectExpr(
        "-1L AS event_id",
        s"timestamp_millis($BaseMs + 360000000) AS ts", // +100 h
        "-1L AS user_id", "'flush' AS event_type",
        "CAST(0.0 AS DOUBLE) AS value"))
      spark.read.parquet(src).schema
    }
    val (sesOk, sesSec) = timeIt {
      val out = runStream(spark, sesDir.getAbsolutePath + "/src",
        sesDir, sesSchema,
        df => StreamOps.sessionize(df.as[StreamOps.Event]).toDF())
        .filter(col("user_id") >= 0)
      val r = out.agg(count(lit(1)).as("n_ses"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("events") =!= 10, 1L).otherwise(0L)).as("bad_ev"),
        sum(when(unix_millis(col("end")) - unix_millis(col("start"))
          =!= 540000L, 1L).otherwise(0L)).as("bad_span"),
        sum(col("total_value")).as("mass")).head()
      r.getLong(0) == users * 10 && r.getLong(1) == users &&
        r.getLong(2) == 0L && r.getLong(3) == 0L &&
        r.getDouble(4) == n.toDouble
    }

    // -- watermarked exact dedup -----------------------------------
    val dupDir = fresh(s"dup_${n}_$attempt")
    val (dupSchema, genSec2) = timeIt {
      val src = writeSrc(dupDocs(spark, n), dupDir, parts)
      spark.read.parquet(src).schema
    }
    val (dedupOk, dedupSec) = timeIt {
      val out = runStream(spark, dupDir.getAbsolutePath + "/src",
        dupDir, dupSchema, df => StreamOps.dedupByFingerprint(df))
      val r = out.agg(count(lit(1)).as("kept"),
        countDistinct(col("fp")).as("fps")).head()
      r.getLong(0) == n / 2 && r.getLong(1) == n / 2
    }

    // -- watermarked tumbling windows ------------------------------
    val winDir = fresh(s"win_${n}_$attempt")
    val (winSchema, genSec3) = timeIt {
      val src = writeSrc(secondEvents(spark, n), winDir, parts)
      addSentinel(spark, src, spark.range(1).selectExpr(
        "-1L AS event_id",
        s"timestamp_millis($BaseMs + (${n} + 7200) * 1000) AS ts",
        "-1L AS user_id", "'flush' AS event_type",
        "CAST(0.0 AS DOUBLE) AS value"))
      spark.read.parquet(src).schema
    }
    val (winOk, winSec) = timeIt {
      val out = runStream(spark, winDir.getAbsolutePath + "/src",
        winDir, winSchema, df => StreamOps.hourlyByType(df))
        .filter(col("event_type") =!= "flush")
      val fullHours = n / 3600
      val r = out.agg(count(lit(1)).as("rows"),
        sum(col("cnt")).as("mass"),
        sum(when(col("cnt") === 900L, 1L).otherwise(0L)).as("full"),
        countDistinct(col("hour")).as("hours")).head()
      r.getLong(1) == n && r.getLong(2) == fullHours * 4 &&
        r.getLong(3) == (n + 3599) / 3600
    }

    Point(n, genSec1 + genSec2 + genSec3,
      sesSec, sesOk, dedupSec, dedupOk, winSec, winOk, parts)
  }

  def run(spark: SparkSession, sizes: Seq[Long],
      budget: BenchBudget = BenchBudget.unlimited,
      seed: Seq[Point] = Seq.empty): Result = {
    import BenchBudget.{gatedPoints, gatedGuard}
    // SINGLE run per point, budget-gated on the smaller twin (r10
    // verdict items 3/4). The implied-exponent guard (ScaleGuard)
    // still gives a flagged biggest point one extra attempt when its
    // total reads super-linear vs its smaller twin beyond what
    // sustained contention could explain. The re-measure is gated.
    def cost(p: Point): Double = p.sesSec + p.dedupSec + p.winSec
    // measured single-run quiet-host costs (three streaming queries +
    // gen) for the default sizes (see BenchBudget.gatedPoints)
    val DefaultEst = Map(200000L -> 35.0, 1000000L -> 105.0)
    val pts = gatedPoints(budget, "stream", sizes, firstEst = 30.0,
      fixedEst = DefaultEst, seed = seed)(n => runPoint(spark, n, 1))(_.n, cost)
    Result(gatedGuard(budget, "stream", pts)(_.n, cost)(
      n => runPoint(spark, n, 3), merged))
  }
}
