package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Queries re-measured at a SECOND scale point (default sf0.01, i.e.
    * 10x fewer rows than the driver's sf0.1) — the index + dedup
    * families whose scaling behavior the 100TB story rests on. The
    * main run's numbers are the big point; this list re-runs at the
    * small point so the JSON carries the curve (and the per-query
    * log10 ratio ~ scaling exponent for a 10x step). */
  private val ScaleFamilies = Seq(
    "q26_knn_join_brute", "q30_knn_l2", "q33_ivfflat_exact",
    "q39_hnsw_partitioned", "q67_pq_knn", "q69_ivfpq_knn",
    "q75_pq_knn_join", "q78_ivfpq_knn_join",
    "q44_dedup_exact", "q45_ngram_jaccard", "q46_minhash_lsh",
    "q56_jaccard_ppjoin", "q49_embed_dup_ivf", "q65_dup_clusters",
    "q73_decontaminate", "q77_pack_offsets", "q80_range_join",
    "q83_bucketed_join", "q85_bloom_semi_join",
    "q88_incremental_dedup", "q89_lsh_index_probe",
    // iterative + windowed analytics: exactly the family where a
    // super-linear exponent would first show (fixpoint rounds,
    // per-user windows, funnel sequences)
    "q108_merge_rollup", "q109_user_features", "q110_pagerank",
    "q111_funnel", "q112_retention",
    // stateful streaming gates: state size scales with keys/pairs
    "q119_stream_join_gate", "q122_stream_sessionize_gate",
    // graph + model-table ops: wedge-join fan-out and vocab growth are
    // the scaling risks
    "q124_radius_search", "q125_triangle_count", "q126_bigram_lm",
    // the round-5 cost leaders: pair-join dedup gates + shingle
    // inverted-index joins — exactly where a quadratic exponent would
    // surface (q47/q133's brute verification sides are sample-bounded,
    // so their tracked exponent is the operator path's; q127/q131/q134
    // have no quadratic verify side to bound)
    "q47_simhash", "q127_containment", "q131_source_overlap",
    "q133_semdedup", "q134_basket_pairs",
    // round-7 third-pass additions with scale-relevant shapes: the
    // DSIR LM join, the iterative BPE/LPA loops, the per-type
    // rank sort, the calendar explode, and the IVM delta terms
    "q151_dsir_weights", "q155_bpe_learn", "q157_lpa_communities",
    "q163_outlier_trim", "q164_gap_fill", "q165_ivm_join",
    // fourth-wave shapes worth a curve: the phash self-join, the PCA
    // gram join, the PIT range join, and the TWAP window
    "q168_phash_dedup", "q169_pca_power", "q174_pit_join", "q176_twap",
    // round-8: the gram-diagonal substring-dedup family — its
    // candidate bound (sum df^2 under the hot-gram cap) is exactly
    // the kind of claim a 2-point curve should check
    "q184_substring_dedup", "q185_span_removal",
    // round-8 second wave: the fixpoint peel (round count = peel
    // depth, live-edge volume shrinks), the wedge-enumeration pair
    // generators (Σ C(deg,2) claims), and the 6-half-round HITS chain
    "q197_kcore", "q198_link_predict", "q200_hits", "q201_butterflies",
    // round-8 third wave: the shingle-inventory novelty join (first-
    // occurrence volume tracks distinct shingles), the bucket-blocked
    // band self-join (pair growth is the risk the blocking bounds),
    // the streaming LSH gate (persistent bucket store grows with the
    // corpus), and the CDC chunk window + fp aggs
    "q225_ngram_novelty", "q231_band_join", "q234_stream_lsh_gate",
    "q235_cdc_chunks",
    // round-9: the per-doc KN scoring join — doc-bigram volume joins
    // the type inventory; the curve should read ~linear in corpus
    // bigrams — the JL projection, whose n·d·k explode is the shape
    // to watch, the outer-join gate (outer state holds EVERY
    // unmatched view until expiry) and the 7-way cover explode
    "q242_perplexity_filter", "q244_jl_projection",
    "q245_stream_outer_join_gate", "q247_rolling_distinct",
    // round-10: the new pair-join shapes — edit-distance verify volume
    // tracks the gram-blocked candidate set (Σ df² under the cap), the
    // Hamming join tracks block-bucket occupancy, the full-outer gate
    // holds BOTH sides' unmatched state, and the JPEG decode is the
    // heaviest per-row decode kernel in the multimodal tier
    "q254_edit_distance_dedup", "q259_phash_hamming",
    "q252_stream_full_join_gate", "q251_jpeg_decode",
    "q253_repetition_filter",
    // the (v, seed)-keyed fixpoint: state K x nodes per round
    "q257_landmark_bfs", "q255_png_adam7_decode",
    // shard assembly is a bounded groupByKey; decode per-shard work
    "q260_tar_shard_decode")

  /** The top-exponent families get a THIRD scale point (sf0.001): two
    * points can't distinguish a true exponent from a fixed-overhead
    * artifact; three pin the curve across two decades. */
  private val ScaleFamilies3 = Seq(
    "q125_triangle_count", "q126_bigram_lm", "q127_containment",
    "q133_semdedup", "q134_basket_pairs",
    // the r7-verdict similarity-join watch list: their big-point
    // readings regressed 1.4-2x on a contended host with untouched
    // code — a 3-point curve pins their true exponent either way
    "q46_minhash_lsh", "q56_jaccard_ppjoin",
    // round-8: the substring family's 2-point exponent reads ~0.5 —
    // the third point separates its fixed window/checkpoint overhead
    // from the Σ df² candidate growth the cap is meant to bound
    "q184_substring_dedup", "q185_span_removal",
    // round-8 final artifact's top exponent (0.84 — near-linear, as a
    // full shingle-inventory pass should be): the third point pins
    // that it's volume, not a hidden quadratic
    "q225_ngram_novelty",
    // round-9: the rest of r8's top-exponent table — q73's 0.77 was a
    // starved reading (the guard's cap dropped its re-measure; fixed
    // above), the others are honest readings whose curve should be
    // pinned across two decades like q225's
    "q73_decontaminate", "q201_butterflies", "q231_band_join",
    "q235_cdc_chunks")

  /** The CORE of the sf0.01 scale pass: measured BEFORE the harness
    * sections so the exponent story survives a contended host (the
    * full 68-family pass costs ~90s there and was starving the
    * harnesses of their window). All ScaleFamilies3 members (they
    * feed the third point and the mid point) plus one representative
    * of each remaining shape class. The rest of ScaleFamilies runs
    * AFTER the harnesses, budget permitting. */
  private val ScaleCore: Seq[String] = (ScaleFamilies3 ++ Seq(
    "q30_knn_l2", "q39_hnsw_partitioned", "q110_pagerank",
    "q168_phash_dedup", "q244_jl_projection",
    "q254_edit_distance_dedup", "q259_phash_hamming")).distinct

  /** How many of the slowest-by-prior main-pass queries are deferred
    * until AFTER the harness floor (r11 verdict item 3): a contended
    * window then starves the expensive tail, not the per-family scale
    * evidence. */
  private val TailCount = 20

  /** Outcome of one capped measurement ([[Bench.main]]'s runCapped):
    * completed inside the cap (value + wall), cancelled-or-late at
    * the cap (partial wall — never a reading), or a genuine failure
    * well under the cap (original exception carried for the callers
    * that rethrow). */
  private sealed trait Capped[+P]
  private final case class CapDone[P](value: P, sec: Double)
    extends Capped[P]
  private final case class CapHit(sec: Double) extends Capped[Nothing]
  private final case class CapFail(e: Throwable, sec: Double)
    extends Capped[Nothing]

  /** Estimated quiet-host wall of each family's harness FLOOR (its
    * smallest default point, from the harnesses' own fixedEst tables,
    * plus headroom for gen + guard overheads). Reserved out of the
    * budget at startup and released family-by-family right before
    * each floor runs — `fits` arithmetic, not section ordering, is
    * what guarantees all four floors a window (r12 lost 3 of 4 floors
    * to an uncapped reading upstream). */
  private[graft] val FloorReserve = Seq(
    "vector" -> 12.0, // fixedEst 10k = 6s
    "graph" -> 50.0, // fixedEst 100k = 32s
    "stream" -> 55.0, // fixedEst 200k = 35s
    "text" -> 45.0) // lsh 10 + sub 8 + hh 8 + web 4 at 100k

  /** Mutable emission snapshot, shared between the main thread (writes
    * at section checkpoints) and the watchdog thread (reads at the
    * hard stop). Fields hold immutable values; @volatile for
    * visibility. r10 verdict item 2: nothing was flushed as sections
    * completed, so the driver's timeout (rc=124) left NO artifact. */
  private final class EmitState {
    @volatile var results: Seq[(String, Double)] = Nil
    @volatile var mainFailures: Seq[String] = Nil
    @volatile var capped: Seq[(String, Double)] = Nil
    @volatile var regressions: Seq[String] = Nil
    @volatile var scalePriors: Seq[(String, Double)] = Nil
    @volatile var scaleJson: String = "null"
    @volatile var exponents: Seq[(String, Double)] = Nil
    @volatile var noiseJson: String = "null"
    @volatile var driftJson: String = "null"
    @volatile var vectorJson: String = "null"
    @volatile var textJson: String = "null"
    @volatile var graphJson: String = "null"
    @volatile var streamJson: String = "null"
    @volatile var headline: Seq[(String, Double)] = Nil
    @volatile var priors: Seq[(String, Double)] = Nil
    @volatile var headlinePriors: Seq[(String, Double)] = Nil
    @volatile var contRatio: Double = 1.0
    @volatile var complete: Boolean = false
  }

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaleDir =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // comma-separated substring filter for fast iteration, e.g.
    // SPARK_GRAFT_BENCH_FILTER=q47,q65
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)

    // ---- wall-clock deadline (r10 verdict item 1) ---------------------
    // BENCH_r10 was rc=124/parsed=null: the suite's quiet-host floor
    // (~19 min) outgrew the driver's window and nothing inside the
    // bench could notice. The deadline bounds the bench's OWN wall:
    // every section is budget-gated (skip-and-record), and a watchdog
    // guarantees the compact JSON line + detail file exist even if a
    // block overruns its estimate. Default 900s keeps worst-case
    // total wall (deadline + 45s grace + ~40s sbt/JVM startup) under
    // ~16.5 min: r9's shape — best-of-2 everywhere, doubled harness
    // points, a true wall plausibly ≥15 min — cleared the driver's
    // window, while r10's ~19+ min did not, so the window is
    // somewhere above ~16 min and 900s leaves real margin. On a
    // quiet host the whole suite (harness 1M points included) fits;
    // on a contended one the gates shed the text tails first.
    val deadlineSec: Double =
      sys.env.get("SPARK_GRAFT_BENCH_DEADLINE_SEC") match {
        case Some("") | Some("0") | Some("off") => Double.MaxValue
        case Some(v) => v.trim.toDouble
        case None => 900.0
      }
    val graceSec = sys.env.get("SPARK_GRAFT_BENCH_GRACE_SEC")
      .map(_.trim.toDouble).getOrElse(45.0)
    val budget = new BenchBudget(t0, deadlineSec)

    // ---- cross-round drift baseline (r9 verdict item 2) --------------
    // The PRIOR round's detail artifact is still on disk at this point
    // (it's overwritten only at checkpoint time): read its min-merged
    // `priors` map (r12+; falls back to the run's own `queries` map for
    // older artifacts) as the drift baselines AND as this run's
    // per-query cost estimates for scheduling and capping. r9 shipped
    // the substring-dedup 1M point at 3.1x its r8 value with untouched
    // code because nothing compared a reading to its own predecessor;
    // r11's contended window would have shipped q203=172.3s as next
    // round's baseline because nothing protected the priors from host
    // weather (see DriftBaseline.mergePriors).
    val priorPath = sys.env.getOrElse("SPARK_GRAFT_PRIOR_DETAIL",
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json"))
    val priorText: String =
      try {
        val src = scala.io.Source.fromFile(priorPath)
        try src.mkString finally src.close()
      } catch { case _: Throwable => "" }
    val priorQueries: Map[String, Double] = DriftBaseline.queriesOf(priorText)
    val priorHeadline: Map[String, Double] = DriftBaseline.headlineOf(priorText)
    // Small-point (sf0.01) baselines for the scale pass's order and
    // caps, CLIPPED at the big-point prior: a small-point reading
    // larger than its 10x-rows big twin is starvation by construction
    // (the twin rule the noise guard runs on), and the r12 bootstrap
    // source — the driver artifact's own `small` map — carries
    // exactly such readings (q110 56.8s small vs 3.4s big prior).
    val scalePriors: Map[String, Double] =
      DriftBaseline.scaleOf(priorText).map { case (k, v) =>
        k -> math.min(v, priorQueries.getOrElse(k, v))
      }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC pin: Tables.fixEventTs's NTZ->TIMESTAMP cast is session-tz
      // dependent; Verify/specs pin UTC, so Bench must too or events
      // wall-clocks (and windowed/sessionize timings) diverge from
      // what was verified
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- emission machinery -------------------------------------------
    val st = new EmitState
    st.priors = priorQueries.toSeq.sortBy(_._1) // a mid-run kill ships
    st.headlinePriors = priorHeadline.toSeq.sortBy(_._1) // old priors
    st.scalePriors = scalePriors.toSeq.sortBy(_._1)
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      "BENCH_DETAIL.json")
    def jsonMap(kv: Seq[(String, Double)]) = kv
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def jsonArr(xs: Seq[String]) =
      xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    def r3(v: Double) = math.rint(v * 1000) / 1000
    def budgetJson: String = {
      val dl = if (deadlineSec == Double.MaxValue) "null"
        else deadlineSec.toString
      s"""{"deadline_sec":$dl,"elapsed_sec":${r3(budget.elapsedSec)},""" +
        s""""complete":${st.complete}}"""
    }
    /** Full detail JSON from the CURRENT state — sections not yet run
      * are null, so a kill at any point leaves parseable JSON with
      * whatever completed. */
    def detailJson(): String = {
      val total = st.results.map(_._2).sum
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""queries":${jsonMap(st.results)},""" +
        s""""recall":${jsonMap(GateMetrics.snapshot)},""" +
        s""""failures":${jsonArr(st.mainFailures)},""" +
        s""""capped":${jsonMap(st.capped)},""" +
        s""""regressions":${jsonArr(st.regressions)},""" +
        s""""scale":${st.scaleJson},""" +
        s""""vector_scale":${st.vectorJson},""" +
        s""""text_scale":${st.textJson},""" +
        s""""graph_scale":${st.graphJson},""" +
        s""""stream_scale":${st.streamJson},""" +
        s""""noise_guard":${st.noiseJson},""" +
        s""""headline_metrics":${jsonMap(st.headline)},""" +
        s""""drift_guard":${st.driftJson},""" +
        s""""priors":${jsonMap(st.priors)},""" +
        s""""headline_priors":${jsonMap(st.headlinePriors)},""" +
        s""""scale_priors":${jsonMap(st.scalePriors)},""" +
        s""""contention":{"median_vs_prior":${r3(st.contRatio)},""" +
        s""""contended":${st.contRatio > DriftBaseline.MaxQuietRatio}},""" +
        s""""skipped":${jsonArr(budget.skipped)},""" +
        s""""budget":$budgetJson,"sf":"$sfDir"}"""
    }
    /** Compact stdout line from the CURRENT state. The driver captures
      * only the last ~2000 chars of stdout and parses the JSON line out
      * of that tail; a 6KB line gets its head truncated (every
      * BENCH_r{1..4}.json showed parsed:null). So the FULL artifact
      * goes to the detail file and stdout's one line is built to a
      * strict char budget (scale-family queries first, then
      * slowest-five). */
    def compactLine(detailOk: Boolean): String = {
      val results = st.results
      val big = results.toMap
      val total = results.map(_._2).sum
      val failsCompact = s"""{"n":${st.mainFailures.size},""" +
        s""""first":${jsonArr(st.mainFailures.take(5))}}"""
      val expMax = st.exponents.sortBy(-_._2).headOption
      val expJson = expMax.map { case (k, v) =>
        s""","worst_scale_exponent":{"query":"$k","log10_ratio_for_10x_rows":${r3(v)}}"""
      }.getOrElse("")
      val slowest = results.sortBy(-_._2).take(5).map(_._1)
      val headNames = (ScaleFamilies.filter(big.contains) ++ slowest).distinct
      val hlCompact =
        if (st.headline.isEmpty) ""
        else s""","headline":${jsonMap(st.headline.map {
          case (k, v) => k -> r3(v) })}"""
      // the run self-declares its weather (r11 verdict item 7): how
      // many queries hit the per-query cap, this run's median
      // reading-vs-prior ratio, and (r12 advice) how many QUIET-window
      // caps survived escalation as genuine-regression suspects
      val weatherCompact =
        s""","capped":${st.capped.size},"cont_mult":${r3(st.contRatio)}""" +
          s""","regr":${st.regressions.size}"""
      val skippedCompact =
        s""","skipped_n":${budget.skipped.size}"""
      val detailJsonRef = if (detailOk) s""""$detailPath"""" else "null"
      def line(names: Seq[String]): String = {
        val qs = jsonMap(names.map(n => n -> r3(big(n))))
        s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"failures":$failsCompact$expJson$hlCompact$weatherCompact$skippedCompact,"budget":$budgetJson,"detail":$detailJsonRef,"sf":"$sfDir"}"""
      }
      // bounded: after headNames.size+1 steps the seq is empty
      Iterator.iterate(headNames)(_.dropRight(1))
        .take(headNames.size + 1)
        .map(line).find(_.length <= 1700).getOrElse(line(Seq.empty))
    }
    val lastLine = new java.util.concurrent.atomic.AtomicReference[String](
      s"""{"metric":"total","value":0,"unit":"sec","n_queries":0,"queries":{},"failures":{"n":0,"first":[]},"note":"pre_main","sf":"$sfDir"}""")
    /** Atomic detail write (tmp+rename: a watchdog halt mid-write must
      * not leave truncated JSON) + refresh the stdout line snapshot. */
    def checkpoint(): Unit = {
      val ok =
        try {
          val tmp = new java.io.File(detailPath + ".tmp")
          val w = new java.io.PrintWriter(tmp)
          try w.println(detailJson()) finally w.close()
          val dst = new java.io.File(detailPath)
          dst.delete()
          tmp.renameTo(dst)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] detail write failed: ${e.getMessage}")
          false
        }
      lastLine.set(compactLine(ok))
    }
    // exactly-once stdout emission, shared by the normal path and the
    // watchdog
    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def emitStdout(): Unit =
      if (printed.compareAndSet(false, true)) {
        println(lastLine.get)
        Console.out.flush()
      }
    // ---- watchdog (guaranteed emission) -------------------------------
    // Soft deadline: cancel running Spark jobs so an overrunning block
    // fails fast and the main thread falls through its (gated) sections
    // to the final emit. Hard stop (deadline+grace): print the latest
    // checkpointed line and halt — the detail file is already on disk.
    // halt(0), not exit: no shutdown-hook raciness, and rc must be 0
    // for the driver to record the parsed line.
    if (deadlineSec != Double.MaxValue) {
      val w = new Thread(() => {
        try {
          var softFired = false
          while (!printed.get) {
            val el = budget.elapsedSec
            if (el >= deadlineSec + graceSec) {
              emitStdout()
              Runtime.getRuntime.halt(0)
            } else if (el >= deadlineSec) {
              if (!softFired)
                System.err.println("[bench] deadline reached — cancelling jobs")
              softFired = true
              try spark.sparkContext.cancelAllJobs()
              catch { case _: Throwable => () }
              Thread.sleep(5000)
            } else {
              Thread.sleep(math.max(50L,
                math.min((deadlineSec - el) * 1000, 5000).toLong))
            }
          }
        } catch { case _: InterruptedException => () }
      }, "bench-deadline-watchdog")
      w.setDaemon(true)
      w.start()
    }

    // JVM/codegen/scan warmup so timings reflect steady state (the
    // reference's timing harness reruns queries for the same reason,
    // tools/sqllogictest/sqllogictest.cpp:135-157)
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Tables.load(spark, sfDir, "lineitem")
        .groupBy("l_returnflag").count().collect()
      Tables.load(spark, sfDir, "embeddings").count()
      Tables.load(spark, sfDir, "documents").count()
      // Pre-validate the ScratchGuard-ed scratch layouts OUTSIDE the
      // timed region: each guarded query's first execution otherwise
      // carries the guard's full-table signature scan (and a rebuild
      // when the source regenerated), inflating its first reading.
      // q83 belongs here too (r13): its bucketed tables are gated on
      // catalog.tableExists, which is PER-JVM — every fresh JVM's
      // first q83 execution silently re-ran the one-time layout write
      // (~3.5s at sf0.1 vs 0.28s for the join itself), which is the
      // real identity of the recurring "q83 13.8x drift" flag.
      Seq("q83_bucketed_join", "q84_date_partition_prune",
          "q113_source_roundtrip", "q139_snapshot_read",
          "q165_ivm_join").foreach { g =>
        SparkEntry.queries.get(g).foreach(fn => fn(spark, sfDir).count())
      }
    } catch { case _: Throwable => () }
    checkpoint()

    // Streaming-gate pre-warm: each stream gate's FIRST execution per
    // (JVM, dir) runs the REAL micro-batched stream to its
    // exactly-once file sink (46s for q234's 8-trigger LSH store at
    // sf0.1); every later execution is the committed-replay + gate
    // aggregation — which is what the prior rounds' best-of-2 minima
    // measured, so that's what the timed pass must measure for
    // cross-round comparability. The setups are independent
    // (per-gate checkpoint dirs) and their cost is mostly micro-batch
    // scheduling latency, so they run CONCURRENTLY here: ~110s of
    // serial cold wall overlaps to ~30-45s. Budget-gated; a skipped
    // pre-warm just means those gates time their cold run (the noise
    // guard then flags + re-measures them as before).
    val streamGates = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains("_stream_"))
      .filter { case (n, _) => filter.forall(_.exists(n.contains)) }
    def prewarmGates(dir: String, estSec: Double): Unit =
      if (streamGates.nonEmpty &&
          budget.fits(s"stream_prewarm_$dir", estSec)) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(streamGates.size, 6))
        val futs = streamGates.map { case (n, fn) =>
          pool.submit(new Runnable {
            def run(): Unit =
              try { fn(spark, dir).count(); () }
              catch { case e: Throwable =>
                System.err.println(s"[bench] prewarm $n: ${e.getMessage}")
              }
          })
        }
        futs.foreach(f => try f.get() catch { case _: Throwable => () })
        pool.shutdown()
      }
    prewarmGates(sfDir, 70.0)
    checkpoint()

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    type QFn = (SparkSession, String) => org.apache.spark.sql.DataFrame

    // ---- the capped-measurement primitive (r12 verdict item 1) --------
    // EVERY measured section — main pass, sf0.01/sf0.001 scale passes,
    // family floors, harness points (via budget.capper), guard
    // re-measures — runs through one hermetic primitive: caches
    // cleared, the work inside its own Spark job group, a REPEATED
    // cancel from the cap on (a single cancel can land between a
    // multi-job query's jobs — cancelJobGroup only kills ACTIVE jobs;
    // r12's rework watched q66 outlive its 30s cap to 39.1s exactly
    // that way). r12's artifact lost 3 of 4 family floors and 20 tail
    // queries to ONE uncapped 56.8s sf0.01 reading — the cap machinery
    // existed but only the main pass used it.
    val capScheduler =
      java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "bench-query-cap")
        t.setDaemon(true)
        t
      })
    def runCapped[P](tag: String, capSec: Double)(body: => P): Capped[P] = {
      // clearCache drops the SQL cache but NOT raw persisted /
      // localCheckpointed RDDs: the iterative ops eagerly
      // localCheckpoint every round, and those blocks survive until
      // their dead RDD objects happen to be GC'd — which a 128GB
      // heap rarely does mid-run. Three consecutive driver windows
      // read the iterative small points (q110/q125 at sf0.01, q203)
      // at ~10x their fresh-JVM values LATE in the window while the
      // run rated quiet overall; a fresh-JVM rerun of the same
      // queries at the same HEAD measured normal. Orphaned blocks
      // squeeze the unified memory pool's execution share, so drop
      // every leftover persisted RDD at the query boundary — the
      // measurement is hermetic, nothing may live across it anyway.
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      // Caps exist to protect the DEADLINE window; a deadline-off run
      // wants every reading even when starved (the full-evidence
      // substring-1M point — quiet 97.5s — was cancelled at the 300s
      // cap clamp under a ~3x burst, losing the round's refresh of
      // its curve). With the deadline off, measure uncapped — the
      // noise/drift best-of-2 guards still correct starved readings,
      // which is exactly how the pre-cap full-evidence runs worked.
      val capped = deadlineSec != Double.MaxValue
      val group = s"bench-$tag"
      spark.sparkContext.setJobGroup(group, tag, interruptOnCancel = true)
      val cancel =
        if (!capped) None
        else Some(capScheduler.scheduleWithFixedDelay(new Runnable {
          def run(): Unit =
            try spark.sparkContext.cancelJobGroup(group)
            catch { case _: Throwable => () }
        }, (capSec * 1000).toLong, 2000L,
          java.util.concurrent.TimeUnit.MILLISECONDS))
      val t0q = System.nanoTime()
      try {
        val v = body
        val t = (System.nanoTime() - t0q) / 1e9
        // completed but past the cap (the cancel raced a job
        // boundary): starved beyond what the cap deems usable —
        // a capped marker, never a reading
        if (capped && t > capSec) CapHit(t) else CapDone(v, t)
      } catch { case e: Throwable =>
        val el = (System.nanoTime() - t0q) / 1e9
        if (capped && el >= capSec * 0.9) CapHit(el) else CapFail(e, el)
      } finally {
        cancel.foreach(_.cancel(false))
        spark.sparkContext.clearJobGroup()
      }
    }
    // wire the same primitive into the harness sections' point loop
    // (BenchBudget.gatedPoints/gatedGuard): a starved floor or rest
    // point is cancelled at pointCapSec(est) and recorded
    // `<fam>_<n>_capped`; a genuine in-cap failure still reaches the
    // section's fail-loud marker
    budget.capper = Some(new BenchBudget.Capper {
      def apply[P](tag: String, capSec: Double)(body: => P): Option[P] =
        runCapped(tag, capSec)(body) match {
          case CapDone(v, _) => Some(v)
          case CapHit(t) =>
            System.err.println(
              f"[bench] $tag CAPPED at $t%.1fs (cap $capSec%.1fs)")
            None
          case CapFail(e, _) => throw e
        }
    })
    // hold the floors' estimated wall out of every earlier fits call
    // — released share-by-share right before each floor section, so
    // a contended main pass CANNOT eat the per-family scale evidence
    FloorReserve.foreach { case (_, share) => budget.addReserve(share) }

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.exists(n.contains)) }

    // ---- main pass: prior-scheduled, per-query gated AND capped -------
    // r11 verdict item 1: the r11 window let q203 run 172s (prior
    // 4.9s), eating 19% of the window and starving 114 queries + every
    // harness point. Three changes:
    //  - CHEAPEST-FIRST by prior (the r11 lexicographic cut silently
    //    dropped the whole q26-q99 block);
    //  - each query gated on prior x the run's own rolling contention
    //    multiplier (median measured/prior so far — a contended host
    //    scales every later estimate up with the evidence);
    //  - each query runs in its own Spark job group, cancelled at
    //    ~min(max(8 x prior, 5s), 30s) — an overrun is recorded as
    //    capped_<name> with the partial wall, never a reading.
    val priorMedian: Double = {
      val vs = priorQueries.values.toSeq.sorted
      vs.lift(vs.size / 2).getOrElse(1.0)
    }
    def estOf(name: String): Double = priorQueries.getOrElse(name, priorMedian)
    def mainCapSec(name: String): Double = priorQueries.get(name)
      .map(p => math.min(math.max(8 * p, 5.0), 30.0))
      .getOrElse(30.0)
    val ratioBuf = scala.collection.mutable.ArrayBuffer.empty[Double]
    // The scheduling multiplier is the WORSE of the global median and
    // a last-12 windowed median. The global median alone is blind to
    // bursts: this host's starvation arrives in multi-minute waves,
    // and a wave starting at query 250 is invisible in the median of
    // 250 quiet readings — run 3 of the r13 rework watched the main
    // head overshoot its fits boundary by ~8 capped-out queries and
    // starve every floor. The windowed median sees a wave within ~6
    // queries (estimates scale up, fits starts refusing, the head
    // stops early, the floors run while the window still exists) and
    // recovers as fast when the wave passes.
    def contMult: Double = {
      val rs = ratioBuf.sorted
      val global = if (rs.size < 5) 1.0 else rs(rs.size / 2)
      val win = ratioBuf.takeRight(12).sorted
      val recent = if (win.size < 6) 1.0 else win(win.size / 2)
      math.max(1.0, math.max(global, recent))
    }
    val cappedBuf =
      scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val resultsBuf =
      scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    // flag-time drift evidence (r12 verdict item 2): name ->
    // (prior, first reading, best-of-2 final); `confirmed` marks
    // entries whose immediate re-measure RAN (raise-grade evidence
    // for the priors merge) — the old end-of-run drift pass was
    // starved out of the window two rounds straight, shipping
    // final == first on every flag
    val driftBuf = scala.collection.mutable.LinkedHashMap
      .empty[String, (Double, Double, Double)]
    val driftConfirmed = scala.collection.mutable.Set.empty[String]
    var mainSkips = 0
    def runMainQuery(name: String, fn: QFn): Unit = {
      if (!budget.fits(s"main_$name", estOf(name) * contMult)) {
        mainSkips += 1
        return
      }
      val prior = priorQueries.get(name)
      val capSec = mainCapSec(name)
      runCapped(name, capSec)(fn(spark, sfDir).count()) match {
        case CapDone(_, t) =>
          // drift is re-measured AT FLAG TIME, inside the same cap:
          // one immediate best-of-2 confirms a genuine slowdown or
          // clears a starved reading while the window still exists
          var fin = t
          if (DriftBaseline.drifted(prior, t) &&
              budget.fits(s"drift_remeasure_$name",
                math.min(t, capSec) + 1)) {
            runCapped(s"drift-$name", capSec)(
              fn(spark, sfDir).count()) match {
              case CapDone(_, t2) =>
                fin = math.min(t, t2)
                driftConfirmed += name
              case _ => ()
            }
          }
          if (DriftBaseline.drifted(prior, t))
            driftBuf(name) = ((prior.get, t, fin))
          resultsBuf += name -> fin
          prior.filter(_ > 0.05).foreach(p => ratioBuf += fin / p)
          st.contRatio = contMult
        case CapHit(el) =>
          cappedBuf += name -> el
          st.capped = cappedBuf.toSeq
          budget.skip(s"capped_$name")
          // the capped wall is a LOWER BOUND on the true reading —
          // fold it into the contention evidence (r12 advice: a
          // window whose worst queries all capped must not rate
          // quiet off the survivors alone)
          prior.filter(_ > 0.05).foreach(p => ratioBuf += el / p)
          System.err.println(f"[bench] $name CAPPED at $el%.1fs " +
            f"(cap $capSec%.1fs, prior ${prior.getOrElse(-1.0)}%.2fs)")
        case CapFail(e, _) =>
          if (budget.remainingSec <= 0) {
            budget.skip(s"main_deadline_$name")
          } else {
            failures += name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
      }
      if (resultsBuf.size % 25 == 0) {
        st.results = resultsBuf.toSeq
        checkpoint()
      }
    }
    val ordered = selected.sortBy { case (n, _) => (estOf(n), n) }
    val (mainHead, mainTail) =
      ordered.splitAt(math.max(0, ordered.size - TailCount))
    mainHead.foreach { case (name, fn) => runMainQuery(name, fn) }
    st.results = resultsBuf.toSeq
    checkpoint()

    // Scale curve: the same measurement at the small point for the
    // index/dedup families (skipped when the main run already is the
    // small point). SINGLE run each (r10 verdict item 6: the exponent
    // math needs one number; the guards catch starvation). Split in
    // two: the CORE families now (they feed the exponent story, the
    // third point, and the mid point), the rest AFTER the harness
    // sections — a contended host then degrades to core-exponents +
    // harness points instead of full-exponents + nothing.
    //
    // r12 verdict items 1/4: this pass used to run a FIXED list,
    // uncapped — q110_pagerank read 56.8s at sf0.01 (quiet same-HEAD:
    // 3.4s) and single-handedly starved 3 of 4 family floors plus the
    // 20-query tail out of the artifact. Now it is scheduled exactly
    // like the main pass: CHEAPEST-FIRST by its own min-merged small
    // priors (the measured order is visible in the detail artifact's
    // `scale.small` map, which preserves run order), each query gated
    // on prior x the rolling contention multiplier, each cancelled at
    // min(max(8 x small-prior, 5s), 30s) in its own job group.
    val scaleMedian: Double = {
      val vs = scalePriors.values.toSeq.sorted
      vs.lift(vs.size / 2).getOrElse(1.0)
    }
    def scaleEstOf(name: String): Double =
      scalePriors.getOrElse(name, scaleMedian)
    def scalePass(fams: Seq[String], tag: String): Seq[(String, Double)] =
      if (scaleDir == sfDir) Seq.empty
      else selected.filter(q => fams.contains(q._1))
        .sortBy { case (n, _) => (scaleEstOf(n), n) }
        .flatMap { case (name, fn) =>
          if (!budget.fits(s"${tag}_$name", scaleEstOf(name) * contMult))
            None
          else {
            val capSec = scalePriors.get(name)
              .map(p => math.min(math.max(8 * p, 5.0), 30.0))
              .getOrElse(30.0)
            runCapped(s"$tag-$name", capSec)(
              fn(spark, scaleDir).count()) match {
              case CapDone(_, t) =>
                // small readings vs small priors are contention
                // evidence too — the earlier this run knows its
                // weather, the better every later gate's estimate
                scalePriors.get(name).filter(_ > 0.05)
                  .foreach(p => ratioBuf += t / p)
                Some(name -> t)
              case CapHit(el) =>
                cappedBuf += s"$tag:$name" -> el
                st.capped = cappedBuf.toSeq
                budget.skip(s"capped_${tag}_$name")
                scalePriors.get(name).filter(_ > 0.05)
                  .foreach(p => ratioBuf += el / p)
                System.err.println(f"[bench] $tag $name CAPPED at " +
                  f"$el%.1fs (cap $capSec%.1fs)")
                None
              case CapFail(e, _) =>
                if (budget.remainingSec <= 0)
                  budget.skip(s"${tag}_deadline_$name")
                else {
                  failures += name
                  System.err.println(
                    s"[bench] $tag $name FAILED: ${e.getMessage}")
                }
                None
            }
          }
        }
    // (The core pass itself runs AFTER the family floors — r13: run 1
    // of this rework held the floors' 162s reserve through the core
    // pass and fits-skipped 12 of its 21 queries on a contended
    // window; the floors releasing their shares first gives the core
    // pass the same window it had before the reserve existed.)

    // ---- reserved harness floor (r11 verdict item 3) -------------------
    // One SMALL point per scale family, run BEFORE the main pass's
    // expensive tail and all guard re-measures: a contended window
    // then ships degraded-but-present per-family scale evidence
    // instead of none (BENCH_r11 carried zero harness points and an
    // empty headline because everything after the main pass was
    // budget-skipped). The full sections later run the REMAINING
    // sizes, seeded with these floor points so estimates, guards, and
    // the emitted curve all see the whole family.
    def parseSizes(envKey: String, defaults: Seq[Long]): Option[Seq[Long]] =
      sys.env.get(envKey) match {
        case Some("") | Some("0") | Some("off") => None
        case ov =>
          Some(ov.map(_.split(',').map(_.trim.toLong).toSeq)
            .getOrElse(defaults))
      }
    val vectorSizes =
      parseSizes("SPARK_GRAFT_VECTOR_SCALE", Seq(10000L, 100000L, 1000000L))
    val graphSizes =
      parseSizes("SPARK_GRAFT_GRAPH_SCALE", Seq(100000L, 1000000L))
    val streamSizes =
      parseSizes("SPARK_GRAFT_STREAM_SCALE", Seq(200000L, 1000000L))
    val textSizes =
      parseSizes("SPARK_GRAFT_TEXT_SCALE", Seq(100000L, 1000000L))
    // A harness call that THROWS stays loud in the artifact (vs null =
    // disabled by env): "CANCELLED_DEADLINE" when the watchdog's
    // job-cancel interrupted an in-flight block at the soft deadline,
    // "FAILED" for a genuine crash.
    def trySection[R](tag: String)(runIt: => R)(json: R => String)
        : (Option[R], String) =
      try {
        spark.catalog.clearCache()
        val r = runIt
        (Some(r), json(r))
      } catch { case e: Throwable =>
        val why =
          if (budget.remainingSec <= 0) "CANCELLED_DEADLINE"
          else "FAILED"
        System.err.println(s"[bench] $tag $why: ${e.getMessage}")
        (None, "\"" + why + "\"")
      }
    // Each floor releases ITS reserve share right before running (the
    // share was held out of every earlier fits call), so the floor's
    // own inner gates see the window that was reserved for it. A
    // family disabled by env still releases — the reserve protects
    // floors that WILL run, never pads the budget.
    val reserveShare = FloorReserve.toMap
    budget.releaseReserve(reserveShare("vector"))
    val (vFloor, vFloorJson) = vectorSizes.map(ss =>
      trySection("vector_floor")(
        VectorScaleBench.run(spark, ss.take(1), None, budget))(_.json))
      .getOrElse((None, "null"))
    st.vectorJson = vFloorJson
    checkpoint()
    budget.releaseReserve(reserveShare("graph"))
    val (gFloor, gFloorJson) = graphSizes.map(ss =>
      trySection("graph_floor")(
        GraphScaleBench.run(spark, ss.take(1), budget))(_.json))
      .getOrElse((None, "null"))
    st.graphJson = gFloorJson
    checkpoint()
    budget.releaseReserve(reserveShare("stream"))
    val (sFloor, sFloorJson) = streamSizes.map(ss =>
      trySection("stream_floor")(
        StreamScaleBench.run(spark, ss.take(1), budget))(_.json))
      .getOrElse((None, "null"))
    st.streamJson = sFloorJson
    checkpoint()
    budget.releaseReserve(reserveShare("text"))
    val (tFloor, tFloorJson) = textSizes.map(ss =>
      trySection("text_floor")(
        TextScaleBench.run(spark, ss.take(1), None, budget))(_.json))
      .getOrElse((None, "null"))
    st.textJson = tFloorJson
    checkpoint()

    // core sf0.01 pass, now that every floor has run and the reserve
    // is fully released (see the comment at scalePass)
    val scaleSmallCore = scalePass(ScaleCore, "scale_core")
    checkpoint()

    // ---- main-pass tail (the slowest-by-prior queries) -----------------
    mainTail.foreach { case (name, fn) => runMainQuery(name, fn) }

    // ---- quiet-window cap escalation (r12 advice, medium) --------------
    // A cap that fires on a QUIET window is evidence of code, not
    // weather — and without escalation a genuine >=8x regression can
    // never produce a reading again: the cap cancels it every round,
    // its old prior rides forward via mergePriors, and the drift
    // guard never sees it. Each main-pass capped query gets ONE
    // re-run at a 4x-cap ceiling: a completion is a real reading
    // (recorded in results, visible to drift + priors), and one that
    // completes past its original cap — or still won't finish, or
    // can't afford its slot — stays a loud `regressions` entry.
    val regressionsBuf = scala.collection.mutable.ArrayBuffer.empty[String]
    val qByName = selected.toMap
    val mainCapped = cappedBuf.toSeq.collect {
      case (n, w) if !n.contains(":") => (n, w) // scale-pass caps keep
    } //  their small-point cap; escalation is a big-point re-reading
    if (contMult <= DriftBaseline.MaxQuietRatio) {
      mainCapped.foreach { case (name, _) =>
        val capSec = mainCapSec(name)
        val escCap = math.min(4 * capSec, 120.0)
        if (budget.fits(s"cap_escalate_$name", escCap)) {
          runCapped(s"escalate-$name", escCap)(
            qByName(name)(spark, sfDir).count()) match {
            case CapDone(_, t) =>
              resultsBuf += name -> t
              if (t > capSec) {
                regressionsBuf += name
                // a completed past-cap reading is raise-grade
                // evidence: it reproduced under escalation, so the
                // baseline may adopt it (loudly, via `regressions`)
                priorQueries.get(name).foreach { p =>
                  driftBuf(name) = ((p, t, t))
                }
                driftConfirmed += name
              }
            case CapHit(el) =>
              regressionsBuf += name
              System.err.println(f"[bench] $name still capped at " +
                f"$el%.1fs under escalation (cap $escCap%.1fs)")
            case CapFail(e, _) =>
              if (budget.remainingSec > 0) failures += name
              System.err.println(
                s"[bench] escalate $name FAILED: ${e.getMessage}")
          }
        } else regressionsBuf += name // unresolved quiet-window cap
      }
      st.regressions = regressionsBuf.toSeq.sorted
    }

    val results = resultsBuf.toSeq
    st.results = results
    val mainFailures = failures.distinct.toSeq
    st.mainFailures = mainFailures
    checkpoint()

    // Burst-capped CORE small points get one retry now that the tail
    // has run — the starvation waves on this host last minutes, and a
    // wave that covers the core pass has usually passed by here (runs
    // 2 and 5 of this rework each lost 4-7 sub-2s-quiet core twins to
    // a wave that was over before the window was). Only when the
    // windowed multiplier has recovered; a still-contended run keeps
    // its honest capped markers.
    val coreCapped = cappedBuf.toSeq.collect {
      case (n, _) if n.startsWith("scale_core:") =>
        n.stripPrefix("scale_core:")
    }
    val scaleSmallCoreAll =
      if (coreCapped.isEmpty || contMult > DriftBaseline.MaxQuietRatio)
        scaleSmallCore
      else scaleSmallCore ++ scalePass(coreCapped, "scale_core_retry")

    // ---- host-noise guard -------------------------------------------
    // This box has documented intermittent hypervisor CPU starvation:
    // identical code swings a random subset of queries 5-100x between
    // runs (r3's official artifact carried a physically-impossible
    // q46=144s AT THE SMALL SCALE POINT). Before emitting, re-measure
    // any reading that looks starved and keep the MINIMUM — starvation
    // only ever inflates a time, never deflates it — and record both
    // values so the artifact is auditable.
    //   flagged when: small-point slower than its 10x-rows big twin;
    //   big point >4x its small twin; or >3x the run median (and >1s)
    //   AND anomalous vs its own prior — without the prior condition
    //   the median rule flags the suite's naturally-slow tail (~90 of
    //   302 readings in run 1 of this rework, all legitimate) every
    //   run and burns the guard window re-measuring healthy queries.
    // EVERY flagged query is re-measured, each re-measure budget-gated
    // (a starved reading that can't afford its re-run ships as-is and
    // is visible in noise_guard.*_first) — re-measures run in
    // DESCENDING-time order so a tight budget fixes the biggest
    // distortions first, and each PASS has a wall cap: on a
    // systemically contended host the median rule flags dozens of
    // readings, and run after run showed an uncapped pass eating the
    // entire harness window to shave modest inflations.
    /** One capped re-measure attempt pair: each run bounded at
      * `capSec` in its own job group (the guards must never become
      * the thing that eats the window — r12 verdict item 1 lists the
      * guard re-measures among the uncapped sections). Returns the
      * minimum of the attempts that completed; None when both were
      * cancelled or failed. */
    def bestOf2Capped(name: String, fn: QFn, dir: String,
        capSec: Double): Option[Double] = {
      def one(tag: String): Option[Double] =
        runCapped(tag, capSec)(fn(spark, dir).count()) match {
          case CapDone(_, t) => Some(t)
          case CapHit(_) => None
          case CapFail(e, _) =>
            System.err.println(s"[bench] $tag FAILED: ${e.getMessage}")
            None
        }
      val a = one(s"re1-$name")
      val b = one(s"re2-$name")
      (a.toSeq ++ b.toSeq).reduceOption((x, y) => math.min(x, y))
    }
    /** Returns (guarded readings, flagged names, RE-MEASURED names) —
      * the third set feeds the priors merge: only a best-of-2-confirmed
      * raise may lift a baseline (see the priors block below). `priors`
      * scopes the median rule to prior-anomalous readings; the small
      * passes pass Map.empty (their readings have no same-dir priors).
      * Each re-measure run is capped at 1.5x the flagged reading (the
      * true value can only be LOWER than a starved one; a rerun that
      * cannot even match the flagged wall is itself starved). */
    def remeasurePass(first: Seq[(String, Double)], twins: Map[String, Double],
        dir: String, bigSide: Boolean, passWallSec: Double,
        priors: Map[String, Double] = Map.empty)
        : (Seq[(String, Double)], Seq[String], Set[String]) = {
      val passEnd = budget.elapsedSec +
        math.min(passWallSec, 0.25 * budget.remainingSec)
      val med = first.map(_._2).sorted.lift(first.size / 2).getOrElse(0.0)
      val flagged = first.filter { case (n, t) =>
        val twin = twins.get(n)
        val vsTwin =
          if (bigSide) twin.exists(t > 4 * _) else twin.exists(t > _)
        vsTwin || (t > 3 * med && t > 1.0 &&
          priors.get(n).forall(p => p <= 0 || t > 1.5 * p))
      }.map(_._1).toSet
      val updates = first.filter(p => flagged(p._1)).sortBy(-_._2)
        .flatMap { case (n, t) =>
          if (budget.elapsedSec < passEnd &&
              budget.fits(s"noise_remeasure_$n", 2 * t + 1))
            bestOf2Capped(n, qByName(n), dir,
              math.min(1.5 * t + 2.0, 45.0))
              .map(v => n -> math.min(t, v))
          else None
        }.toMap
      val redone = first.map { case (n, t) =>
        n -> updates.getOrElse(n, t)
      }
      (redone, flagged.toSeq.sorted, updates.keySet)
    }
    // The big-vs-small-twin rule here sees only the CORE small twins
    // (intentional narrowing vs r10: the rest of the small pass now
    // runs after the harnesses) — the non-core families get their twin
    // check in the LATE pass below, once scale_rest lands; until then
    // only the 3x-median rule covers them.
    val (results2, mainFlagged, noiseRemeasured) =
      remeasurePass(results, scaleSmallCoreAll.toMap, sfDir,
        bigSide = true, passWallSec = 90.0, priors = priorQueries)

    // Cross-round drift (r9 verdict item 2) was re-measured AT FLAG
    // TIME inside the main pass (r12 verdict item 2: the end-of-run
    // drift pass shipped `final == first` on all five r12 flags —
    // starved out of the window two rounds straight). The artifact's
    // drift block reads the flag-time evidence.
    val driftEntries: Seq[(String, (Double, Double, Double))] =
      driftBuf.toSeq
    st.results = results2
    val (scaleCore2, coreFlagged, coreRemeasured) =
      remeasurePass(scaleSmallCoreAll, results2.toMap, scaleDir,
        bigSide = false, passWallSec = 40.0)

    // first readings keyed per pass: a query measured at BOTH scale
    // points would otherwise collide and report the wrong original
    val firstMain = results.toMap

    // ---- scale-block JSON (checkpoint before the harnesses) ----------
    // third-point/mid-point JSON starts null and is filled by the
    // POST-harness refinement pass (moved in r11: ~32s of exponent
    // refinement must not starve the harness sections of the window)
    var scale3Json = "null"
    var midJson = "null"
    /** Scale + noise blocks from the (possibly partial) small set —
      * called after the core pass now and again after the post-harness
      * rest pass, so the artifact carries whatever completed. Reads
      * the CURRENT big-point readings from st.results (the late twin
      * pass can still update them). */
    def refreshScaleState(small2: Seq[(String, Double)],
        smallFlagged: Seq[String],
        firstSmall: Map[String, Double],
        mainFlaggedNow: Seq[String]): Unit = {
      val bigNow = st.results.toMap
      val exponents = small2.collect {
        case (k, small) if small > 0 && bigNow.contains(k) =>
          k -> math.log10(bigNow(k) / small)
      }
      st.exponents = exponents
      val scaleFailures = failures.distinct.diff(mainFailures).toSeq
      st.scaleJson =
        if (small2.isEmpty && scaleFailures.isEmpty) "null"
        else s"""{"small_sf":"$scaleDir","small":${jsonMap(small2)},""" +
          s""""log10_ratio_for_10x_rows":${jsonMap(exponents)},""" +
          s""""third_point":$scale3Json,""" +
          s""""mid_point":$midJson,""" +
          s""""failures":${jsonArr(scaleFailures)}}"""
      st.noiseJson =
        if (mainFlaggedNow.isEmpty && smallFlagged.isEmpty) "null"
        else s"""{"main_first":${
            jsonMap(mainFlaggedNow.flatMap(n =>
              firstMain.get(n).map(n -> _)))},""" +
          s""""small_first":${
            jsonMap(smallFlagged.flatMap(n =>
              firstSmall.get(n).map(n -> _)))}}"""
    }
    refreshScaleState(scaleCore2, coreFlagged, scaleSmallCoreAll.toMap,
      mainFlagged)
    st.driftJson =
      s"""{"prior_path":"$priorPath",""" +
        s""""n_prior_queries":${priorQueries.size},""" +
        s""""flagged":${driftEntries.map { case (n, (p, f, fin)) =>
          s""""$n":{"prior":$p,"first":$f,"final":$fin}"""
        }.mkString("{", ",", "}")},""" +
        s""""harness_flagged":{}}"""
    checkpoint()

    // ---- scale harnesses (remaining sizes, seeded with the floor) ----
    // BASELINE.md commits to in-harness benchmarks at 10k-1M rows with
    // planted/exact ground truth; the sf tables top out far below
    // that, so these run on deterministic generated corpora. Every
    // point is budget-gated (BenchBudget.gatedPoints: the small twin
    // predicts the big point, a skip is recorded). Order encodes
    // priority under a tight window: vector and graph carry the ANN +
    // graph scale story, stream's 1M is the rows/s headline, and the
    // text tails (substring 47-534s observed, hh ~51s) go LAST — they
    // are the historical timeout hazards and their quiet-host
    // readings live in SURVEY §8.5. A rest call that fails keeps the
    // floor JSON in the artifact rather than overwriting it.
    val hardN: Option[Long] =
      sys.env.get("SPARK_GRAFT_VECTOR_HARD") match {
        case Some("") | Some("0") | Some("off") => None
        case Some(v) => Some(v.trim.toLong)
        case None => Some(200000L)
      }
    // The rest call runs the sizes the floor did NOT measure (r12
    // advice: positional drop(1) never re-attempted a floor size that
    // was budget-skipped or capped — now a lost floor point is
    // retried here once the window recovers), and a rest call that
    // FAILS keeps the floor JSON with an explicit `"rest"` marker
    // spliced in instead of silently shipping floor-only output.
    def restSizes[P](all: Seq[Long], seedPts: Seq[P])(n: P => Long)
        : Seq[Long] = {
      val seen = seedPts.map(n).toSet
      all.filterNot(seen)
    }
    def withRestMarker(floorJson: String, restJson: String): String =
      if (floorJson.endsWith("}"))
        floorJson.dropRight(1) + s""","rest":$restJson}"""
      else floorJson
    val (vsResult0, vsJson) = vectorSizes.map(ss =>
      trySection("vector_scale")(
        VectorScaleBench.run(spark,
          restSizes(ss, vFloor.map(_.points).getOrElse(Seq.empty))(_.n),
          None, budget,
          seed = vFloor.map(_.points).getOrElse(Seq.empty)))(_.json))
      .getOrElse((None, "null"))
    st.vectorJson = if (vsResult0.isDefined || vFloor.isEmpty) vsJson
      else withRestMarker(vFloorJson, vsJson)
    checkpoint()

    val (gsResult, gsJson) = graphSizes.map(ss =>
      trySection("graph_scale")(
        GraphScaleBench.run(spark,
          restSizes(ss, gFloor.map(_.points).getOrElse(Seq.empty))(_.n),
          budget,
          seed = gFloor.map(_.points).getOrElse(Seq.empty)))(_.json))
      .getOrElse((None, "null"))
    st.graphJson = if (gsResult.isDefined || gFloor.isEmpty) gsJson
      else withRestMarker(gFloorJson, gsJson)
    checkpoint()

    val (ssResult, ssJson) = streamSizes.map(ss =>
      trySection("stream_scale")(
        StreamScaleBench.run(spark,
          restSizes(ss, sFloor.map(_.points).getOrElse(Seq.empty))(_.n),
          budget,
          seed = sFloor.map(_.points).getOrElse(Seq.empty)))(_.json))
      .getOrElse((None, "null"))
    st.streamJson = if (ssResult.isDefined || sFloor.isEmpty) ssJson
      else withRestMarker(sFloorJson, ssJson)
    checkpoint()

    // SPARK_GRAFT_TEXT_SWEEP: the hard-corpus banding sweep's size
    // ("off"/"0"/"" disables; unset = 200k) — same pattern as the
    // vector hard corpus
    val sweepN = sys.env.get("SPARK_GRAFT_TEXT_SWEEP") match {
      case Some("") | Some("0") | Some("off") => None
      case Some(v) => Some(v.trim.toLong)
      case None => Some(200000L)
    }
    val (tsResult, tsJson) = textSizes.map(ss =>
      trySection("text_scale")(
        TextScaleBench.run(spark,
          restSizes(ss,
            tFloor.map(_.points).getOrElse(Seq.empty))(_.n),
          sweepN, budget, seed = tFloor))(_.json))
      .getOrElse((None, "null"))
    st.textJson = if (tsResult.isDefined || tFloor.isEmpty) tsJson
      else withRestMarker(tFloorJson, tsJson)
    checkpoint()

    // ---- vector hard sweep (post-harness refinement) -------------------
    // the uniform-corpus probe/ef ↔ recall sweep the easy clustered
    // corpus hides; gated like every refinement block
    val vsResult: Option[VectorScaleBench.Result] =
      vsResult0.orElse(vFloor).map { r =>
        val hard = hardN
          .filter(n => budget.fits(s"vector_hard_$n", 35.0))
          .flatMap { n =>
            try Some(VectorScaleBench.runHard(spark, n))
            catch { case e: Throwable =>
              System.err.println(s"[bench] vector_hard FAILED: ${e.getMessage}")
              None
            }
          }
        VectorScaleBench.Result(r.points, hard)
      }
    vsResult.foreach(r => st.vectorJson = r.json)
    checkpoint()

    // ---- exponent refinement (post-harness) ---------------------------
    // third (tiny) scale point for the top-exponent families — same
    // hermetic measurement, noise-guarded against the small twin
    val scale3Dir =
      sys.env.getOrElse("SPARK_GRAFT_SCALE3_DIR", "/root/testdata/sf0.001")
    val scale3First =
      if (scale3Dir == sfDir || scale3Dir == scaleDir ||
          !budget.fits("scale3_pass", 20.0)) Seq.empty
      else selected.filter(q => ScaleFamilies3.contains(q._1)).flatMap {
        case (name, fn) =>
          // tiny-point readings are sub-second on a quiet host; a
          // fixed 15s cap bounds a starved one at ~1.7% of the window
          runCapped(s"tiny-$name", 15.0)(
            fn(spark, scale3Dir).count()) match {
            case CapDone(_, t) => Some(name -> t)
            case CapHit(_) =>
              budget.skip(s"capped_tiny_$name"); None
            case CapFail(e, _) =>
              failures += name
              System.err.println(
                s"[bench] tiny $name FAILED: ${e.getMessage}")
              None
          }
      }
    val (scale3, _, _) =
      remeasurePass(scale3First, scaleCore2.toMap, scale3Dir,
        bigSide = false, passWallSec = 20.0)
    val smallMap = scaleCore2.toMap
    val exponents3 = scale3.collect {
      case (k, tiny) if tiny > 0 && smallMap.contains(k) =>
        k -> math.log10(smallMap(k) / tiny)
    }
    scale3Json =
      if (scale3.isEmpty) "null"
      else s"""{"tiny_sf":"$scale3Dir","tiny":${jsonMap(scale3)},""" +
        s""""log10_ratio_small_over_tiny":${jsonMap(exponents3)}}"""

    // mid point for knee diagnosis (r9 verdict item 6): q225's 3-pt
    // curve reads tiny->small 0.08 but small->big 0.74 — two decades
    // can't say whether the knee is fixed overhead finally amortized
    // or a growing term. A half-decade point between small and big
    // pins which segment the growth lives in: the documents table of
    // the BIG sf subsampled deterministically to ~3.16x the small row
    // count (doc_id % 10 < 3), written once to a scratch dir and
    // measured hermetically (single run; guards cover starvation).
    val MidFamilies = Seq("q225_ngram_novelty") // documents-only queries
    val midPoint: Seq[(String, Double, Long)] =
      if (scaleDir == sfDir || !budget.fits("mid_point", 12.0)) Seq.empty
      else try {
        val midDir = "target/bench_mid"
        val src = Tables.load(spark, sfDir, "documents")
        val midDocs = src.filter(org.apache.spark.sql.functions
          .pmod(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.lit(10L)) < 3)
        midDocs.write.mode("overwrite")
          .parquet(s"$midDir/documents.parquet")
        val n = spark.read.parquet(s"$midDir/documents.parquet").count()
        selected.filter(q => MidFamilies.contains(q._1)).flatMap {
          case (name, fn) =>
            runCapped(s"mid-$name", 30.0)(
              fn(spark, midDir).count()) match {
              case CapDone(_, t) => Some((name, t, n))
              case CapHit(_) =>
                budget.skip(s"capped_mid_$name"); None
              case CapFail(e, _) =>
                System.err.println(
                  s"[bench] mid $name FAILED: ${e.getMessage}")
                None
            }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] mid point FAILED: ${e.getMessage}")
        Seq.empty
      }
    // doc counts for the mid-point exponents, read NOW (not at emit:
    // the watchdog cancels Spark jobs after the soft deadline, and the
    // emit path must stay Spark-free)
    val (nSmallDocs, nBigDocs) =
      if (midPoint.isEmpty) (0L, 0L)
      else (Tables.load(spark, scaleDir, "documents").count(),
        Tables.load(spark, sfDir, "documents").count())
    // mid-point segment exponents: time ratio per decade of docs on
    // each side of the mid point (rows ratios from actual doc counts)
    midJson =
      if (midPoint.isEmpty) "null"
      else {
        val bigNow = st.results.toMap
        val entries = midPoint.map { case (k, t, n) =>
          val sm = smallMap.get(k)
          val bg = bigNow.get(k)
          val expS = sm.collect { case s if s > 0 && t > 0 && n > nSmallDocs =>
            math.log10(t / s) / math.log10(n.toDouble / nSmallDocs) }
          val expB = bg.collect { case b if b > 0 && t > 0 && nBigDocs > n =>
            math.log10(b / t) / math.log10(nBigDocs.toDouble / n) }
          s""""$k":{"n_docs":$n,"sec":$t""" +
            expS.map(e => s""","exp_small_to_mid":${r3(e)}""").getOrElse("") +
            expB.map(e => s""","exp_mid_to_big":${r3(e)}""").getOrElse("") + "}"
        }
        entries.mkString("{", ",", "}")
      }

    // ---- rest of the sf0.01 scale pass (after the harnesses) ---------
    // the non-core exponent families, budget permitting — the stream
    // gates among them get their per-dir setup pre-warmed concurrently
    // first (same rationale as the main-pass prewarm)
    val restFams = ScaleFamilies.filterNot(ScaleCore.contains)
    if (scaleDir != sfDir &&
        restFams.exists(f => selected.exists(_._1 == f)) &&
        budget.remainingSec > 40.0)
      prewarmGates(scaleDir, 40.0)
    val scaleSmallRest = scalePass(restFams, "scale_rest")
    val (scaleRest2, restFlagged, restRemeasured) =
      remeasurePass(scaleSmallRest, st.results.toMap, scaleDir,
        bigSide = false, passWallSec = 30.0)
    // LATE twin pass (r11 ADVICE item 3): now that the non-core small
    // twins exist, give the main-pass readings outside ScaleCore their
    // big-vs-4x-small-twin check too (they only had the 3x-median rule
    // at the early pass) — re-measures budget-gated as always.
    val (results3, lateFlagged, lateRemeasured) =
      remeasurePass(st.results, scaleRest2.toMap, sfDir,
        bigSide = true, passWallSec = 30.0, priors = priorQueries)
    st.results = results3
    refreshScaleState(scaleCore2 ++ scaleRest2,
      (coreFlagged ++ restFlagged).sorted,
      (scaleSmallCoreAll ++ scaleSmallRest).toMap,
      (mainFlagged ++ lateFlagged).distinct.sorted)

    // flat harness headline metrics, one entry per COMPLETED point,
    // keyed `<metric>@<n>` (r11 ADVICE item 1: the unkeyed lastOption
    // emission shipped a 100k reading under the same name as a prior
    // 1M one whenever the big point was budget-skipped, feeding the
    // drift guard readings taken at different scales — the n in the
    // key makes every cross-round comparison same-scale by
    // construction, and a contended window that only affords the
    // floor still emits ITS point instead of an empty map).
    def perPoint[P](res: Option[P])(
        pts: P => Seq[(Long, Seq[(String, Double)])])
        : Seq[(String, Double)] =
      (for {
        r <- res.toSeq
        (n, kvs) <- pts(r)
        (k, v) <- kvs
      } yield s"$k@$n" -> v)
    val headlineNow: Seq[(String, Double)] =
      perPoint(tsResult.orElse(tFloor))(r =>
        r.points.map(p => p.n -> Seq("lsh_sec" -> p.lshSec)) ++
          r.sub.map(sp => sp.n -> Seq("sub_sec" -> sp.subSec))) ++
        perPoint(gsResult.orElse(gFloor))(r =>
          r.points.map(p => p.n -> Seq("tri_sec" -> p.triSec,
            "pr_sec" -> p.prSec, "kcore_sec" -> p.kcSec,
            "mst_sec" -> p.mstSec))) ++
        perPoint(ssResult.orElse(sFloor))(r =>
          r.points.map(p => p.n -> Seq("session_sec" -> p.sesSec))) ++
        perPoint(vsResult)(r =>
          r.points.map(p => p.n -> Seq("brute_sec" -> p.bruteSec)))
    st.headline = headlineNow
    // harness readings >1.5x their prior-round twin are flagged in the
    // artifact; their re-measure mechanism is the in-harness ScaleGuard
    // (an extra full harness pass here would double bench wall time)
    val harnessDrift = headlineNow.collect {
      case (k, v) if DriftBaseline.drifted(priorHeadline.get(k), v) =>
        (k, priorHeadline(k), v)
    }
    val harnessDriftJson = harnessDrift.map { case (k, p, v) =>
      s""""$k":{"prior":$p,"now":$v}"""
    }.mkString("{", ",", "}")
    st.driftJson =
      s"""{"prior_path":"$priorPath",""" +
        s""""n_prior_queries":${priorQueries.size},""" +
        s""""flagged":${driftEntries.map { case (n, (p, f, fin)) =>
          s""""$n":{"prior":$p,"first":$f,"final":$fin}"""
        }.mkString("{", ",", "}")},""" +
        s""""harness_flagged":$harnessDriftJson}"""

    // ---- next round's baselines (r11 verdict item 2) -------------------
    // min-merged priors: a contended run can only LOWER a baseline;
    // skipped/capped queries carry their old prior forward. On top of
    // the run-level rating, a PER-QUERY protection: a reading that
    // drifted past 1.5x its prior may only raise the baseline when a
    // best-of-2 re-measure CONFIRMED it (run 1 of this rework was
    // quiet by median yet adopted q66's randomly-starved 39.1s — on
    // this host single readings are never raise-grade evidence). The
    // contention rating comes from the guarded final readings (the
    // richest evidence); the harness headline merge reuses it ORed
    // with the headline map's own rating (few entries, so its own
    // median may be uninformative).
    val remeasured = noiseRemeasured ++ driftConfirmed ++
      lateRemeasured
    val finalMap = DriftBaseline.protectRaises(priorQueries,
      st.results.toMap, remeasured)
    // weather is rated on the RAW readings (the finalMap filter above
    // only protects baselines, it must not flatter the rating), PLUS
    // the capped walls as LOWER-BOUND ratios (r12 advice: the rating
    // had survivorship bias — a window whose worst queries all capped
    // could still rate quiet off the survivors and let mergePriors
    // adopt their sub-1.5x-inflated readings)
    val resultNames = st.results.map(_._1).toSet
    val cappedLowerBounds = mainCapped.collect {
      case (n, w) if !resultNames(n) => n -> w
    }.toMap
    val queryRatio = DriftBaseline.contentionRatio(priorQueries,
      st.results.toMap ++ cappedLowerBounds)
    st.contRatio = queryRatio
    val headlineRatio =
      DriftBaseline.contentionRatio(priorHeadline, headlineNow.toMap)
    // several caps in one window are themselves contention evidence
    // (each is a >=8x-or-30s excursion) even when the survivor median
    // reads quiet
    val contended = queryRatio > DriftBaseline.MaxQuietRatio ||
      cappedLowerBounds.size >= 3
    st.priors = DriftBaseline.mergePriors(priorQueries, finalMap,
      contended).toSeq.sortBy(_._1)
    // small-point baselines for next round's scale-pass order + caps:
    // identical min-merge discipline (protectRaises with the small
    // passes' own best-of-2-confirmed re-measures as raise evidence)
    val smallFinal = (scaleCore2 ++ scaleRest2).toMap
    st.scalePriors = DriftBaseline.mergePriors(scalePriors,
      DriftBaseline.protectRaises(scalePriors, smallFinal,
        coreRemeasured ++ restRemeasured),
      contended).toSeq.sortBy(_._1)
    // headline entries get the same per-entry protection as queries,
    // but stricter: there is NO in-run best-of-2 for a harness point
    // (the in-harness ScaleGuard only fires on implied exponent), so
    // a drift-flagged headline reading can never raise its baseline —
    // the full run after run 3 read mst@1M at 72.2s (prior 25.3,
    // flagged 2.85x, starvation burst) and the unprotected merge
    // adopted it
    val headlineSafe =
      DriftBaseline.protectRaises(priorHeadline, headlineNow.toMap)
    st.headlinePriors = DriftBaseline.mergePriors(priorHeadline,
      headlineSafe,
      contended || headlineRatio > DriftBaseline.MaxQuietRatio)
      .toSeq.sortBy(_._1)
    // complete = every section reached its natural end (skips by
    // budget are RECORDED degradation, not incompleteness; failures
    // and caps are carried in their own fields)
    st.complete = mainSkips == 0
    checkpoint()
    emitStdout()
    spark.stop()
  }
}
