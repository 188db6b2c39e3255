package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.index.IvfFlat
import graft.streaming.StreamOps

/** Driver-gated correctness queries for the STREAMING surface
  * ([[graft.streaming.StreamOps]]) — each runs a real Structured
  * Streaming query in-process (file source → AvailableNow trigger →
  * exactly-once parquet file sink), reads the sink back, and emits a
  * single gate row that (a) DuckDB can recompute from the same parquet
  * tables and (b) carries an in-engine stream==batch equivalence flag.
  * The reference has no streaming (SURVEY §2.6); these gates make the
  * Spark-native extension driver-visible instead of sbt-test-only.
  *
  * Scale shape: the stream never touches the driver — file source to
  * file sink, same plan as production ingestion; only the final gate
  * scalars are collected. The sink/checkpoint live under a per-process
  * temp root (deleted on JVM exit), so a re-run within one process is
  * an idempotent no-op replay (checkpoint says all files committed)
  * and separate processes never share state.
  */
object StreamGateOps {

  type Q = (SparkSession, String) => DataFrame

  private lazy val scratchRoot: java.io.File = {
    val f = java.nio.file.Files.createTempDirectory("graft_stream_").toFile
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => graft.Util.deleteRecursively(f)))
    f
  }

  private def gateDir(kind: String, d: String): String =
    new java.io.File(scratchRoot,
      s"${kind}_${d.replaceAll("[^A-Za-z0-9._-]", "_")}").getAbsolutePath

  /** The file stream source requires a DIRECTORY; the test tables are
    * single parquet files. Expose a file as a directory via symlink —
    * zero copy, and the link target stays read-only. */
  private def asSourceDir(srcPath: String, dir: String): String = {
    val d = new java.io.File(dir, "src")
    d.mkdirs()
    val link = new java.io.File(d, new java.io.File(srcPath).getName)
    if (!link.exists())
      java.nio.file.Files.createSymbolicLink(link.toPath,
        java.nio.file.Paths.get(srcPath))
    d.getAbsolutePath
  }

  /** Run `build(stream)` from a parquet file source to a parquet sink
    * until no input remains; returns the sink read back as a batch
    * DataFrame. The file sink's commit log makes the append
    * exactly-once across retries/reruns. */
  private def runToSink(s: SparkSession, srcPath: String, dir: String,
      build: DataFrame => DataFrame,
      partitionBy: Seq[String] = Nil): DataFrame = {
    val schema = s.read.parquet(srcPath).schema
    val out = build(s.readStream.schema(schema)
      .parquet(asSourceDir(srcPath, dir)))
    val writer = out.writeStream.format("parquet")
      .option("path", dir + "/out")
      .option("checkpointLocation", dir + "/cp")
      .trigger(Trigger.AvailableNow())
    val q = (if (partitionBy.nonEmpty)
      writer.partitionBy(partitionBy: _*) else writer).start()
    q.awaitTermination()
    s.read.parquet(dir + "/out")
  }

  /** Multiset equality of two frames with identical schemas. */
  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** Write the far-future flush sentinel into `srcDir` once: the zz_
    * path prefix sorts it into the LAST micro-batch (the file source
    * orders unread files by path), its ts is encoded to match the raw
    * source schema (nanos Long or TIMESTAMP_NTZ — the r5 flip), and
    * its watermark advance closes every real row's state so
    * append-mode output flushes before an AvailableNow stream ends —
    * the q122/q162 discipline, shared with q245. */
  private def ensureFlushSentinel(s: SparkSession, dir: String,
      srcDir: String, raw: DataFrame, evBatch: DataFrame,
      offsetHours: Int, eventType: String): Unit = {
    import s.implicits._
    val sentinel = new java.io.File(srcDir, "zz_sentinel.parquet")
    if (!sentinel.exists()) {
      val maxTs = evBatch.agg(max("ts")).head().getTimestamp(0)
      val flushMicros =
        (maxTs.getTime + offsetHours * 3600 * 1000L) * 1000L
      val one = Seq((-1L, flushMicros, -1L, eventType, 0.0, ""))
        .toDF("event_id", "ts_us", "user_id", "event_type", "value",
          "props")
        .withColumn("ts",
          if (raw.schema("ts").dataType == LongType)
            col("ts_us") * 1000L // us -> ns
          else timestamp_micros(col("ts_us")))
        .drop("ts_us")
        .select(raw.schema.map(f => col(f.name).cast(f.dataType)): _*)
      val tmp = dir + "/sentinel_build"
      one.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, sentinel.toPath)
    }
  }

  val queries: Map[String, Q] = Map(
    // Streaming exact dedup gate: stream the documents table through
    // dedupByFingerprint (watermarked dropDuplicatesWithinWatermark —
    // the state-evicting ingestion twin of batch q44), sink to
    // parquet, and pin (a) the surviving fingerprint SET against
    // DuckDB (count + order-invariant xor of the 60-bit fp prefixes —
    // a sum would overflow BIGINT) and (b) survivor fps == the batch
    // path's fps, in-engine. Event time is synthesized from doc_id
    // (the table has no timestamp; ingestion order is id order).
    "q116_stream_dedup_gate" -> ((s, d) => {
      import s.implicits._
      // +1 day: epoch-0 event time sits exactly on the operator's
      // initial watermark boundary and is dropped as late
      val withTs = (df: DataFrame) =>
        df.withColumn("ts",
          timestamp_micros((col("doc_id") + 86400L) * 1000000L))
      val kept = runToSink(s, s"$d/documents.parquet", gateDir("dedup", d),
        src => StreamOps.dedupByFingerprint(withTs(src)))
      val batch = StreamOps.dedupByFingerprint(
        withTs(Tables.load(s, d, "documents")))
      val eq = sameRows(kept.select("fp"), batch.select("fp"))
      val row = kept.agg(count(lit(1)).as("n_kept"),
        expr("bit_xor(cast(conv(substring(fp, 1, 15), 16, 10) as bigint))")
          .as("fp_xor")).head()
      val nDocs = Tables.load(s, d, "documents").count()
      Seq((nDocs, row.getLong(0), row.getLong(1), eq))
        .toDF("n_docs", "n_kept", "fp_xor", "stream_eq_batch")
    }),

    // Stream-static enrichment gate: stream the events table, enrich
    // each fact against the broadcast customer dimension (left join —
    // unmatched facts pass through), sink, and pin match counts
    // against DuckDB's batch left join plus full-row stream==batch
    // equivalence in-engine. events.ts has shipped as BOTH raw-nanos
    // and TIMESTAMP_NTZ parquet across rounds — the stream normalizes
    // through Tables.fixEventTs exactly like the batch twin.
    "q117_stream_enrich_gate" -> ((s, d) => {
      import s.implicits._
      val dim = Tables.load(s, d, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      // Tables.load("events") sets the nanosAsLong conf the raw
      // schema read inside runToSink needs; Tables.fixEventTs
      // normalizes whichever ts type the driver shipped (raw nanos
      // Long or TIMESTAMP_NTZ) to session-tz TIMESTAMP
      val evBatch = Tables.load(s, d, "events")
      val enriched = runToSink(s, s"$d/events.parquet", gateDir("enrich", d),
        src => StreamOps.enrich(Tables.fixEventTs(src), dim, "user_id"))
      val batch = StreamOps.enrich(evBatch, dim, "user_id")
      // type-clean equivalence: exceptAll would coerce across ts types
      // (NTZ sink vs TIMESTAMP twin), so require identical schemas
      // before comparing rows — the flag can never pass on coercion
      val eq = enriched.schema("ts").dataType == batch.schema("ts").dataType &&
        sameRows(enriched, batch)
      val row = enriched.agg(count(lit(1)).as("n_facts"),
        count(col("c_mktsegment")).as("n_matched"),
        countDistinct(when(col("c_mktsegment").isNotNull, col("user_id")))
          .as("matched_users")).head()
      Seq((row.getLong(0), row.getLong(1), row.getLong(2), eq))
        .toDF("n_facts", "n_matched", "matched_users", "stream_eq_batch")
    }),

    // Streaming vector-index ingestion gate: build IVFFlat on a prefix
    // of the embeddings, stream the remainder through ivfIngest
    // (map-side frozen-centroid assignment, zero state) into the
    // index's exactly-once partitioned stream sink, reopen the index
    // with IvfFlat.load (built layout ∪ streamed rows, both
    // partition-pruned), and serve a probe-all KNN — which must
    // hash-match DuckDB's brute force over the FULL table: every
    // streamed vector searchable, nothing duplicated, nothing lost.
    "q118_stream_ivf_ingest_gate" -> ((s, d) => {
      val dir = gateDir("ivfingest", d)
      val vecs = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val model = IvfFlat.build(vecs.filter(col("vec_id") < 300),
        Seq("vec_id"), "v", lists = 8, probeLists = 8)
      model.save(dir)
      val ingest = (src: DataFrame) => StreamOps.ivfIngest(
        src.filter(col("vec_id") >= 300)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
        model)
      val schema = s.read.parquet(s"$d/embeddings.parquet").schema
      val q = ingest(s.readStream.schema(schema)
          .parquet(asSourceDir(s"$d/embeddings.parquet", dir)))
        .writeStream.format("parquet")
        .option("path", dir + "/stream")
        .option("checkpointLocation", dir + "/cp")
        .partitionBy("__bucket")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val query = vecs.filter(col("vec_id") === 0)
        .head().getSeq[Double](1)
      IvfFlat.load(s, dir).scan(query, 10, tieBreak = Some("vec_id"))
        .select(col("vec_id"), round(col("dist"), 6).as("dist"))
    }),

    // STREAM-STREAM interval join gate: view->purchase attribution
    // with BOTH sides unbounded (two independent file-source streams
    // over the events table), watermarked and range-bounded so
    // buffered state stays ~1h of either stream — the join shape that
    // survives 100TB/day. Inner joins emit eagerly per micro-batch
    // (watermarks only bound state eviction), so the sink holds every
    // pair; aggregated to q87's exact DuckDB-checked shape, plus the
    // in-engine stream==batch flag against the unwatermarked twin.
    "q119_stream_join_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("ssjoin", d)
      // one batch read first: sets the nanosAsLong conf + gives the
      // raw schema; both stream sides convert ts exactly as
      // Tables.load does (Tables.fixEventTs handles raw nanos Long
      // AND the driver's TIMESTAMP_NTZ schema)
      val evBatch = Tables.load(s, d, "events")
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val srcDir = asSourceDir(s"$d/events.parquet", dir)
      def side(tpe: String) = Tables.fixEventTs(
        s.readStream.schema(schema).parquet(srcDir))
        .filter(col("event_type") === tpe)
      val q = StreamOps.viewPurchaseJoin(side("view"), side("purchase"))
        .writeStream.format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val pairs = s.read.parquet(dir + "/out")
      val batch = StreamOps.viewPurchaseJoin(
        evBatch.filter(col("event_type") === "view"),
        evBatch.filter(col("event_type") === "purchase"))
      // type-clean (q117 idiom): require identical field types before
      // comparing rows, so a sink-vs-twin timestamp-type drift can
      // never pass via exceptAll's coercion
      def shape(df: DataFrame) = df.schema.fields
        .map(f => (f.name, f.dataType)).toSeq
      val eq = shape(pairs) == shape(batch) && sameRows(pairs, batch)
      pairs.groupBy("user_id")
        .agg(count(lit(1)).as("pairs"),
          countDistinct(col("p_ts")).as("purchases_attributed"))
        .withColumn("stream_eq_batch", lit(eq))
    }),

    // STREAM-STREAM LEFT OUTER interval join gate: the outer twin of
    // q119 — every view emits, matched views per purchase inside
    // [v_ts, v_ts + 30 min], UNMATCHED views with NULL p_ts. Outer
    // rows only release when the global watermark passes a view's
    // whole match window (state expiry IS the emission trigger), so
    // the source carries the zz_ flush sentinel fed through BOTH
    // sides' event_type filters — without it the unmatched set is
    // silently empty and the gate reads as a plain inner join. The
    // batch twin is the same interval join as a plain LEFT JOIN
    // (watermarks are no-ops on batch frames); equivalence compared
    // row-for-row including the NULLs.
    "q245_stream_outer_join_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("ssouter", d)
      val evBatch = Tables.load(s, d, "events")
      val raw = s.read.parquet(s"$d/events.parquet")
      val srcDir = asSourceDir(s"$d/events.parquet", dir)
      ensureFlushSentinel(s, dir, srcDir, raw, evBatch,
        offsetHours = 3, eventType = "zz_flush")
      def side(tpe: String) = Tables.fixEventTs(
        s.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir))
        .filter(col("event_type").isin(tpe, "zz_flush"))
      val q = StreamOps.viewPurchaseJoinOuter(
          side("view"), side("purchase"))
        .writeStream.format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // the sentinel's own view row never expires (its window ends
      // past the final watermark) and would be dropped here anyway
      val out = s.read.parquet(dir + "/out").filter(col("user_id") >= 0)
      val batch = StreamOps.viewPurchaseJoinOuter(
        evBatch.filter(col("event_type") === "view"),
        evBatch.filter(col("event_type") === "purchase"))
      def shape(df: DataFrame) = df.schema.fields
        .map(f => (f.name, f.dataType)).toSeq
      val eq = shape(out) == shape(batch) && sameRows(out, batch)
      out.agg(count(lit(1)).as("n_rows"),
        sum(when(col("p_ts").isNull, 1L).otherwise(0L))
          .as("unmatched_views"),
        count(col("p_ts")).as("pairs"),
        countDistinct(col("user_id")).as("users"),
        countDistinct(when(col("p_ts").isNull, col("user_id")))
          .as("users_with_unmatched"))
        .withColumn("stream_eq_batch", lit(eq))
    }),

    // STREAM-STREAM FULL OUTER interval join gate: the remaining join
    // mode Structured Streaming supports, and the gnarliest expiry
    // semantics — UNMATCHED ROWS EMIT FROM BOTH SIDES, each at its own
    // watermark-driven state expiry (an unmatched purchase holds until
    // the watermark clears the views that could still arrive 30 min
    // BEFORE it; an unmatched view until the purchases 30 min AFTER
    // it). The zz_flush sentinel rides BOTH side filters so both
    // watermarks advance past every real row's window; the sentinel
    // pair matches itself (same user -1, same ts) and is filtered on
    // coalesced user_id. Batch twin: the same function on batch
    // frames (watermarks are no-ops) — row-for-row, NULLs included.
    "q252_stream_full_join_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("ssfull", d)
      val evBatch = Tables.load(s, d, "events")
      val raw = s.read.parquet(s"$d/events.parquet")
      val srcDir = asSourceDir(s"$d/events.parquet", dir)
      ensureFlushSentinel(s, dir, srcDir, raw, evBatch,
        offsetHours = 3, eventType = "zz_flush")
      def side(tpe: String) = Tables.fixEventTs(
        s.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir))
        .filter(col("event_type").isin(tpe, "zz_flush"))
      val q = StreamOps.viewPurchaseJoinFull(
          side("view"), side("purchase"))
        .writeStream.format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.read.parquet(dir + "/out")
        .filter(coalesce(col("v_uid"), col("p_uid")) >= 0)
      val batch = StreamOps.viewPurchaseJoinFull(
        evBatch.filter(col("event_type") === "view"),
        evBatch.filter(col("event_type") === "purchase"))
      def shape(df: DataFrame) = df.schema.fields
        .map(f => (f.name, f.dataType)).toSeq
      val eq = shape(out) == shape(batch) && sameRows(out, batch)
      out.agg(count(lit(1)).as("n_rows"),
        count(when(col("v_ts").isNotNull && col("p_ts").isNotNull, 1))
          .as("pairs"),
        sum(when(col("v_ts").isNotNull && col("p_ts").isNull, 1L)
          .otherwise(0L)).as("unmatched_views"),
        sum(when(col("v_ts").isNull, 1L).otherwise(0L))
          .as("unmatched_purchases"),
        countDistinct(coalesce(col("v_uid"), col("p_uid"))).as("users"))
        .withColumn("stream_eq_batch", lit(eq))
    }),

    // STREAMING AS-OF JOIN gate: the join mode Structured Streaming
    // LACKS natively, built with flatMapGroupsWithState (the brief's
    // custom-state path): every purchase pairs with the latest view
    // at or before its event time, per user. Both sides buffer in
    // typed state; the watermark drives emission (a trade may flush
    // only once no older view can arrive) and prunes the view buffer
    // to ONE old candidate per user. The zz_flush sentinel advances
    // the final watermark past every real trade. Batch twin:
    // one partitioned window with last(ignoreNulls) — row-for-row,
    // NULLs, ids and lag included.
    "q289_stream_asof_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("ssasof", d)
      val evBatch = Tables.load(s, d, "events")
      val raw = s.read.parquet(s"$d/events.parquet")
      val srcDir = asSourceDir(s"$d/events.parquet", dir)
      ensureFlushSentinel(s, dir, srcDir, raw, evBatch,
        offsetHours = 3, eventType = "zz_flush")
      val src = Tables.fixEventTs(s.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir))
        .filter(col("event_type").isin("view", "purchase", "zz_flush"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[StreamOps.Event]
      val q = StreamOps.asofJoin(src)
        .writeStream.format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = s.read.parquet(dir + "/out").filter(col("user_id") >= 0)
      val batch = StreamOps.asofJoinBatch(evBatch)
      def shape(df: DataFrame) = df.schema.fields
        .map(f => (f.name, f.dataType)).toSeq
      val eq = shape(out) == shape(batch) && sameRows(out, batch)
      out.agg(count(lit(1)).as("n_trades"),
        count(col("v_eid")).as("matched"),
        sum(when(col("v_eid").isNull, 1L).otherwise(0L))
          .as("unmatched"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("value_sum"),
        sum(col("lag_us")).as("lag_us_sum"),
        countDistinct(col("user_id")).as("users"))
        .withColumn("stream_eq_batch", lit(eq))
    }),

    // STATEFUL sessionization gate: the flatMapGroupsWithState
    // session operator driven as a real stream. The event-time-timeout
    // states need the watermark to pass last+gap before the final
    // session per user can emit, so the source dir carries a SENTINEL
    // file (one far-future event for user -1, written once) processed
    // as a later micro-batch: maxFilesPerTrigger=1 splits the batches
    // and Spark's file source orders files by PATH, so the sentinel is
    // named zz_sentinel.parquet to sort after any data file name (the
    // ordering is lexicographic, NOT mtime — a symlink's mtime follows
    // its target anyway): its watermark advance
    // times out every real session. Gate row: session counts + an
    // exact-decimal value total the DuckDB window-SQL oracle
    // recomputes, plus the in-engine row-for-row stream==batch flag.
    "q122_stream_sessionize_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("sessionize", d)
      val evBatch = Tables.load(s, d, "events") // nanos conf + batch twin
      val srcDir = asSourceDir(s"$d/events.parquet", dir)
      val raw = s.read.parquet(s"$d/events.parquet")
      // zz_ prefix: the file source orders by path, and the sentinel
      // must be the LAST micro-batch for any data file name — a bare
      // "sentinel.parquet" would sort before e.g. "zevents.parquet"
      // and flush nothing (ADVICE r4)
      ensureFlushSentinel(s, dir, srcDir, raw, evBatch,
        offsetHours = 3, eventType = "flush")
      val src = Tables.fixEventTs(s.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[StreamOps.Event]
      val q = StreamOps.sessionize(src)
        .writeStream.format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sess = s.read.parquet(dir + "/out")
        .filter(col("user_id") >= 0) // drop the sentinel's own session
      // compare at the state's own resolution: SessionState keeps
      // epoch MILLIS (Timestamp.getTime) where the batch twin carries
      // micros, and accumulates value as doubles in arrival order
      // where the twin sums exact decimal — so timestamps compare
      // ms-truncated and values at decimal(18,4); sub-ms session
      // identity is not a property the operator claims
      val cmp = (df: DataFrame) => df.select(col("user_id"),
        unix_millis(col("start")).as("start_ms"),
        unix_millis(col("end")).as("end_ms"),
        col("events").cast("long").as("events"),
        col("total_value").cast("decimal(18,4)").as("tv"))
      val eq = sameRows(cmp(sess), cmp(StreamOps.sessionizeBatch(evBatch)))
      val r = sess.agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("users"),
        sum(col("events").cast("long")).as("events_total"),
        // total_value is a per-session decimal(18,4) sum rendered as
        // double (exact); re-cast and re-sum in decimal => the global
        // decimal sum, immune to float addition order
        round(sum(col("total_value").cast("decimal(18,4)")).cast("double"), 4)
          .as("value_total")).head()
      Seq((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), eq))
        .toDF("n_sessions", "users", "events_total", "value_total",
          "stream_eq_batch")
    }),

    // Hopping-window aggregation gate — the STREAMING twin of q160:
    // watermarked 6h/3h windows over the event stream, append-mode
    // parquet sink, then full stream==batch window-for-window
    // equivalence. A zz_sentinel event 24h past max ts (the q122
    // discipline) advances the final watermark so every real window
    // CLOSES and flushes; the sentinel's own windows are filtered by
    // its event_type. Value sums ride DECIMAL in both twins, so the
    // equivalence is exact, not tolerance-based.
    "q162_stream_hop_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("hopwin", d)
      val evBatch = Tables.load(s, d, "events") // nanos conf + batch twin
      val srcDir = asSourceDir(s"$d/events.parquet", dir)
      val raw = s.read.parquet(s"$d/events.parquet")
      ensureFlushSentinel(s, dir, srcDir, raw, evBatch,
        offsetHours = 24, eventType = "zz_flush")
      val hop = (df: DataFrame) => df
        .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).as("sv"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"), col("sv"))
      val src = Tables.fixEventTs(s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      val q = hop(src.withWatermark("ts", "1 hour"))
        .writeStream.format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sunk = s.read.parquet(dir + "/out")
        .filter(col("event_type") =!= "zz_flush")
      val batch = hop(evBatch)
      val cmp = (df: DataFrame) => df.select(col("win_start_us"),
        col("event_type"), col("n").cast("long"),
        col("sv").cast("decimal(28,6)"))
      val eq = sameRows(cmp(sunk), cmp(batch))
      val r = sunk.agg(count(lit(1)).as("n_windows"),
        sum(col("n").cast("long")).as("events_total"),
        countDistinct(col("event_type")).as("n_types")).head()
      Seq((r.getLong(0), r.getLong(1), r.getLong(2), eq))
        .toDF("n_windows", "events_total", "n_types", "stream_eq_batch")
    }),

    // LATE-DATA accounting gate: watermark semantics made
    // driver-visible. FOUR micro-batches in file-name order
    // (maxFilesPerTrigger=1): the real events, then a 'ya_advance'
    // row at max(ts) — needed because Spark (3.4+) filters late rows
    // with the PREVIOUS batch's watermark (watermarkForLateEvents
    // lags eviction by one batch), so the events-derived watermark
    // only becomes the late-filter two batches later — then a planted
    // batch of 100 'zz_late' rows stamped at the corpus MINIMUM ts
    // (29 days below the now-effective watermark: every one must be
    // DROPPED), and a final zzz sentinel that flushes the windows.
    // The gate pins: none of the planted rows reached the sink, and
    // the surviving totals equal the batch aggregation untouched —
    // i.e., late data changed NOTHING, which is exactly the
    // correctness contract watermarks buy at 100TB ingest.
    "q170_stream_late_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("lategate", d)
      val evBatch = Tables.load(s, d, "events")
      val srcDir = asSourceDir(s"$d/events.parquet", dir)
      val raw = s.read.parquet(s"$d/events.parquet")
      val nLate = 100
      def plant(name: String, tsMicros: Long, n: Int, etype: String)
          : Unit = {
        val f = new java.io.File(srcDir, name)
        if (!f.exists()) {
          val rows = (1 to n).map(i =>
            (-i.toLong, tsMicros, -1L, etype, 0.0, ""))
          val one = rows
            .toDF("event_id", "ts_us", "user_id", "event_type", "value",
              "props")
            .withColumn("ts",
              if (raw.schema("ts").dataType == LongType)
                col("ts_us") * 1000L
              else timestamp_micros(col("ts_us")))
            .drop("ts_us")
            .select(raw.schema.map(x => col(x.name).cast(x.dataType)): _*)
          val tmp = dir + s"/build_$name"
          one.coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath, f.toPath)
        }
      }
      val bounds = evBatch.agg(min("ts"), max("ts")).head()
      plant("ya_advance.parquet", bounds.getTimestamp(1).getTime * 1000L,
        1, "ya_advance")
      plant("zz_late.parquet", bounds.getTimestamp(0).getTime * 1000L,
        nLate, "zz_late")
      plant("zzz_flush.parquet",
        (bounds.getTimestamp(1).getTime + 24 * 3600 * 1000L) * 1000L,
        1, "zzz_flush")
      val src = Tables.fixEventTs(s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
      val q = src.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"))
        .writeStream.format("parquet")
        .option("path", dir + "/out")
        .option("checkpointLocation", dir + "/cp")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sunk = s.read.parquet(dir + "/out")
        .filter(col("event_type") =!= "zzz_flush"
          && col("event_type") =!= "ya_advance")
      val lateInSink = sunk.filter(col("event_type") === "zz_late")
        .agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
      val survived = sunk.filter(col("event_type") =!= "zz_late")
        .agg(coalesce(sum("n"), lit(0L)), count(lit(1))).head()
      val nEvents = evBatch.count()
      Seq((nEvents, nLate.toLong, survived.getLong(0), lateInSink,
        lateInSink == 0 && survived.getLong(0) == nEvents))
        .toDF("n_events", "late_planted", "events_in_sink",
          "late_in_sink", "all_late_dropped")
    }),

    // EXACTLY-ONCE idempotency gate: every streaming gate claims the
    // file sink's commit log makes re-runs no-op replays — this one
    // PROVES it. The same narrow stream (projection over events) runs
    // TWICE against the same checkpoint + sink; the second run must
    // find every source file committed and append NOTHING. The gate
    // pins first-run count == table count == second-run count — the
    // property that makes retried ingestion jobs safe at 100TB (an
    // at-least-once sink would double on every driver restart).
    "q178_stream_idempotent_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("idem", d)
      val evBatch = Tables.load(s, d, "events")
      val srcDir = asSourceDir(s"$d/events.parquet", dir)
      val raw = s.read.parquet(s"$d/events.parquet")
      def runOnce(): Long = {
        val q = Tables.fixEventTs(
            s.readStream.schema(raw.schema).parquet(srcDir))
          .select(col("event_id"), col("user_id"), col("event_type"))
          .writeStream.format("parquet")
          .option("path", dir + "/out")
          .option("checkpointLocation", dir + "/cp")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.read.parquet(dir + "/out").count()
      }
      val first = runOnce()
      val second = runOnce() // replay: commit log says all files done
      val n = evBatch.count()
      Seq((n, first, second, first == n && second == n))
        .toDF("n_events", "after_first_run", "after_second_run",
          "exactly_once")
    }),

    // STREAMING NEAR-DUP LSH GATE — the production crawl-ingestion
    // shape no batch query covers: MinHash-LSH dedup applied
    // INCREMENTALLY as micro-batches arrive, with a persistent bucket
    // store accumulating across batches. Dedup rule (order-free, so
    // the batch twin can recompute it): a doc survives iff it is the
    // MINIMUM doc_id in EVERY band bucket it occupies. Incrementally,
    // with id-ordered micro-batches (8 range slabs, mtime-ordered):
    // drop a doc if any of its buckets is already in the store (an
    // earlier, smaller-id doc owns it) or if it isn't the batch-local
    // bucket minimum; then add ALL the batch's buckets — of dropped
    // docs too, since occupancy is what poisons a bucket — to the
    // store. foreachBatch runs sequentially, so store reads/writes
    // never race. Equivalence to the global rule is checked in-engine
    // (survivor sets compared as multisets); the gate row carries the
    // DuckDB-checkable census + the must-be-zero diff counts (the q47
    // discipline — xxhash band keys can never value-match another
    // engine, the EQUIVALENCE is the oracle-visible fact).
    "q234_stream_lsh_gate" -> ((s, d) => {
      import s.implicits._
      val dir = gateDir("lshstream", d)
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      def bandsOf(df: DataFrame): DataFrame = df
        .select(col("doc_id"),
          org.apache.spark.sql.graft.DistinctShingles.column(
            TextOps.tokens(col("text")), 3).as("sh"))
        // empty shingle sets: constant MinHash signature -> one mega
        // bucket; sub-3-token docs carry no bands and always survive
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), posexplode(
          org.apache.spark.sql.graft.MinHashBands.column(
            col("sh"), numHashes = 64, bands = 16))
          .as(Seq("band", "bkey")))
      val storeDir = dir + "/store"
      val keptDir = dir + "/kept"
      val srcDir = {
        val f = new java.io.File(dir)
        if (!new java.io.File(f, "src").exists())
          graft.StreamScaleBench.writeSrc(docs, f, parts = 8,
            byCol = "doc_id")
        new java.io.File(f, "src").getAbsolutePath
      }
      if (!new java.io.File(keptDir).exists()) {
        val schema = s.read.parquet(srcDir).schema
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .writeStream
          .option("checkpointLocation", dir + "/cp")
          .foreachBatch { (b: DataFrame, _: Long) =>
            val bb = bandsOf(b).localCheckpoint(true)
            val store: Option[DataFrame] =
              if (new java.io.File(storeDir).exists())
                Some(s.read.parquet(storeDir)) else None
            val conflicted = store.map(st =>
              bb.join(st, Seq("band", "bkey"), "left_semi"))
              .getOrElse(bb.limit(0))
              .select("doc_id").distinct()
            val notMin = bb
              .join(bb.groupBy("band", "bkey")
                .agg(min("doc_id").as("mn")), Seq("band", "bkey"))
              .filter(col("doc_id") =!= col("mn"))
              .select("doc_id").distinct()
            val dropped = conflicted.union(notMin).distinct()
            b.select("doc_id")
              .join(dropped, Seq("doc_id"), "left_anti")
              .write.mode(SaveMode.Append).parquet(keptDir)
            bb.select("band", "bkey").distinct()
              .write.mode(SaveMode.Append).parquet(storeDir)
            ()
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val streamKept = s.read.parquet(keptDir).select("doc_id")
      // batch twin of the same rule, one global pass
      val allBands = bandsOf(docs)
      val losers = allBands
        .join(allBands.groupBy("band", "bkey")
          .agg(min("doc_id").as("mn")), Seq("band", "bkey"))
        .filter(col("doc_id") =!= col("mn"))
        .select("doc_id").distinct()
      val batchKept = docs.select("doc_id")
        .join(losers, Seq("doc_id"), "left_anti")
      val missed = batchKept.exceptAll(streamKept).count()
      val extra = streamKept.exceptAll(batchKept).count()
      val nDocs = docs.count()
      Seq((nDocs, missed, extra, missed == 0L && extra == 0L))
        .toDF("n_docs", "missed", "extra", "stream_eq_batch")
    }))

  val oracles: Map[String, String] = Map(
    // q234: band keys are engine-local (xxhash); what DuckDB checks is
    // the census + the zero diff counts + the equivalence flag (q47
    // discipline — the assertion itself is the oracle-visible fact)
    "q234_stream_lsh_gate" ->
      """SELECT count(*) AS n_docs, 0::BIGINT AS missed,
        |  0::BIGINT AS extra, true AS stream_eq_batch
        |FROM documents""".stripMargin,
    "q178_stream_idempotent_gate" ->
      """SELECT count(*) AS n_events, count(*) AS after_first_run,
        |  count(*) AS after_second_run, true AS exactly_once
        |FROM events""".stripMargin,
    "q170_stream_late_gate" ->
      """SELECT count(*) AS n_events, 100::BIGINT AS late_planted,
        |  count(*) AS events_in_sink,
        |  0::BIGINT AS late_in_sink, true AS all_late_dropped
        |FROM events""".stripMargin,
    "q162_stream_hop_gate" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us FROM events
        |), h AS (
        |  SELECT event_type,
        |    (us // 10800000000) * 10800000000 - k * 10800000000
        |      AS win_start_us
        |  FROM e, unnest([0, 1]) AS u(k)
        |), g AS (
        |  SELECT win_start_us, event_type, count(*) AS n
        |  FROM h GROUP BY 1, 2
        |)
        |SELECT count(*) AS n_windows,
        |  CAST(sum(n) AS BIGINT) AS events_total,
        |  count(DISTINCT event_type) AS n_types,
        |  true AS stream_eq_batch
        |FROM g""".stripMargin,
    "q116_stream_dedup_gate" ->
      """WITH fps AS (
        |  SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents
        |)
        |SELECT (SELECT count(*) FROM documents) AS n_docs,
        |  count(*) AS n_kept,
        |  bit_xor(('0x' || fp[1:15])::BIGINT)::BIGINT AS fp_xor,
        |  true AS stream_eq_batch
        |FROM fps""".stripMargin,
    "q117_stream_enrich_gate" ->
      """SELECT count(*) AS n_facts,
        |  count(c_mktsegment) AS n_matched,
        |  count(DISTINCT CASE WHEN c_mktsegment IS NOT NULL
        |    THEN e.user_id END) AS matched_users,
        |  true AS stream_eq_batch
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,
    // the same interval join as a LEFT JOIN — unmatched views kept
    // with NULL p_ts; census over the whole outer result
    "q245_stream_outer_join_gate" ->
      """WITH v AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'view'
        |), p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT v.user_id, v.ts AS v_ts, p.ts AS p_ts
        |  FROM v LEFT JOIN p ON v.user_id = p.user_id
        |    AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
        |)
        |SELECT count(*)::BIGINT AS n_rows,
        |  CAST(sum(CASE WHEN p_ts IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS unmatched_views,
        |  count(p_ts)::BIGINT AS pairs,
        |  count(DISTINCT user_id)::BIGINT AS users,
        |  count(DISTINCT CASE WHEN p_ts IS NULL THEN user_id END)
        |    ::BIGINT AS users_with_unmatched,
        |  true AS stream_eq_batch
        |FROM j""".stripMargin,
    // the FULL JOIN census: both sides' unmatched counts + the flag
    "q252_stream_full_join_gate" ->
      """WITH v AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'view'
        |), p AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT v.user_id AS v_uid, v.ts AS v_ts,
        |    p.user_id AS p_uid, p.ts AS p_ts
        |  FROM v FULL JOIN p ON v.user_id = p.user_id
        |    AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
        |)
        |SELECT count(*)::BIGINT AS n_rows,
        |  count(CASE WHEN v_ts IS NOT NULL AND p_ts IS NOT NULL
        |    THEN 1 END)::BIGINT AS pairs,
        |  CAST(sum(CASE WHEN v_ts IS NOT NULL AND p_ts IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS unmatched_views,
        |  CAST(sum(CASE WHEN v_ts IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS unmatched_purchases,
        |  count(DISTINCT coalesce(v_uid, p_uid))::BIGINT AS users,
        |  true AS stream_eq_batch
        |FROM j""".stripMargin,

    // the AS-OF census: per trade, the latest view ≤ its ts (max_by
    // with the same (ts, event_id) tie-break packed into a HUGEINT:
    // the 2^63 multiplier leaves the full nonnegative BIGINT range
    // for event_id, so the ordering can't collide at any table size)
    "q289_stream_asof_gate" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'view'
        |), t AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT t.user_id, t.event_id AS t_eid, t.ts AS t_ts, t.value,
        |    max_by(v.event_id,
        |      epoch_us(v.ts)::HUGEINT * 9223372036854775808::HUGEINT
        |        + v.event_id) AS v_eid,
        |    max(v.ts) AS v_ts
        |  FROM t LEFT JOIN v
        |    ON t.user_id = v.user_id AND v.ts <= t.ts
        |  GROUP BY 1, 2, 3, 4
        |)
        |SELECT count(*)::BIGINT AS n_trades,
        |  count(v_eid)::BIGINT AS matched,
        |  CAST(sum(CASE WHEN v_eid IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS unmatched,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |    AS value_sum,
        |  CAST(sum(epoch_us(t_ts) - epoch_us(v_ts)) AS BIGINT)
        |    AS lag_us_sum,
        |  count(DISTINCT user_id)::BIGINT AS users,
        |  true AS stream_eq_batch
        |FROM j""".stripMargin,

    // q87's aggregate over the STREAM's sink + the equivalence flag
    "q119_stream_join_gate" ->
      """SELECT v.user_id, count(*) AS pairs,
        |  count(DISTINCT p.ts) AS purchases_attributed,
        |  true AS stream_eq_batch
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
        |GROUP BY v.user_id""".stripMargin,
    // q25's gap-session window SQL, aggregated (sessions, users,
    // events, exact-decimal value total) + the equivalence flag
    "q122_stream_sessionize_gate" ->
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM e
        |), g AS (
        |  SELECT user_id, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM s GROUP BY user_id, session_id
        |)
        |SELECT count(*)::BIGINT AS n_sessions,
        |  count(DISTINCT user_id)::BIGINT AS users,
        |  sum(n)::BIGINT AS events_total,
        |  round(sum(sv)::DOUBLE, 4) AS value_total,
        |  true AS stream_eq_batch
        |FROM g""".stripMargin,
    // probe-all KNN over built ∪ streamed == brute force on the table
    "q118_stream_ivf_ingest_gate" ->
      """SELECT vec_id, round(list_distance(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS dist
        |FROM embeddings
        |ORDER BY list_distance(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), vec_id
        |LIMIT 10""".stripMargin)
}
