package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Streaming correctness = equivalence with the batch run on the same
  * data, driven through MemoryStream epochs (the standard harness). */
@Slow
class StreamingSpec extends SparkSpecBase {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val sample: Seq[Event] = Seq(
    Event(0, ts(1), 1, "click", 1.0),
    Event(1, ts(5), 1, "click", 2.0),
    Event(2, ts(10), 2, "view", 3.0),
    Event(3, ts(65), 1, "click", 4.0),   // new hour, same session? gap 60>30 -> new session
    Event(4, ts(70), 2, "error", 5.0),
    Event(5, ts(130), 1, "click", 6.0),  // gap 65 -> new session
    Event(6, ts(135), 2, "view", 7.0))

  test("streaming hourly agg == batch hourly agg on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.hourlyByType(mem.toDF())
      .writeStream.format("memory").queryName("hourly_t")
      .outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val got = spark.table("hourly_t")
        .select("hour", "event_type", "cnt", "sum_value")
        .collect().map(_.toSeq).toSet
      val want = StreamOps.hourlyByType(sample.toDF())
        .collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from append output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.hourlyByType(mem.toDF())
      .writeStream.format("memory").queryName("hourly_l")
      .outputMode("append").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      // watermark now 02:15 - 1h; an event at 00:01 is > 1h late
      mem.addData(Event(99, ts(1), 9, "late", 1.0))
      q.processAllAvailable()
      // advance watermark far enough to close every window
      mem.addData(Event(100, ts(300), 9, "flush", 1.0))
      q.processAllAvailable()
      val got = spark.table("hourly_l").collect()
      assert(!got.exists(_.getString(1) == "late"))
      assert(got.exists(_.getString(1) == "click"))
    } finally q.stop()
  }

  test("file-source stream over the events parquet == batch hourly agg") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(dir.toString).schema // raw ts type
    val stream = Tables.fixEventTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamOps.hourlyByType(stream)
      .writeStream.format("memory").queryName("hourly_f")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_f").collect().map(_.toSeq).toSet
      val want = StreamOps.hourlyByType(Tables.load(spark, sfDir, "events"))
        .collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("streaming sessionization == batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions_t")
      .outputMode("append").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      // push watermark forward so all sessions time out and emit
      mem.addData(Event(100, ts(600), 99, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_t")
        .filter(col("user_id") =!= 99)
        .select("user_id", "start", "end", "events", "total_value")
        .collect().map(_.toSeq).toSet
      val want = StreamOps.sessionizeBatch(sample.toDF())
        .select("user_id", "start", "end", "events", "total_value")
        .collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("sliding-window rates: stream == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.slidingRates(mem.toDF())
      .writeStream.format("memory").queryName("sliding_t")
      .outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val got = spark.table("sliding_t").collect().map(_.toSeq).toSet
      val want = StreamOps.slidingRates(sample.toDF())
        .collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
      // each event lands in 4 sliding windows (1h window, 15min slide)
      assert(got.toSeq.map(_(2).asInstanceOf[Long]).sum
        == sample.length * 4L)
    } finally q.stop()
  }

  test("cross-batch out-of-order event still matches batch sessionization") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions_o")
      .outputMode("append").start()
    try {
      // batch 1: an event at 12:00 (watermark will lag 1h behind)
      mem.addData(Event(0, ts(720), 5, "a", 1.0))
      q.processAllAvailable()
      // batch 2: same user at 11:05 — above the watermark, older than
      // the live session by > gap: must become its OWN session
      mem.addData(Event(1, ts(665), 5, "b", 2.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts(2000), 9, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_o").filter(col("user_id") === 5)
        .select("start", "end", "events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getInt(2))).toSet
      val want = StreamOps.sessionizeBatch(Seq(
          Event(0, ts(720), 5, "a", 1.0), Event(1, ts(665), 5, "b", 2.0)).toDF())
        .select("start", "end", "events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getInt(2))).toSet
      assert(got == want && got.size == 2)
    } finally q.stop()
  }

  test("two late events within one gap merge into ONE session (batch parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions_l")
      .outputMode("append").start()
    try {
      // live session at 12:00; then one batch holding TWO late events
      // (11:10, 11:15 — inside the 1h watermark) — older than the
      // live session by > gap but within the gap of each other: the
      // batch twin makes one two-event session out of them, so
      // streaming must too.
      mem.addData(Event(0, ts(720), 7, "a", 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(670), 7, "b", 2.0),
        Event(2, ts(675), 7, "c", 3.0))
      q.processAllAvailable()
      mem.addData(Event(99, ts(2000), 9, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_l").filter(col("user_id") === 7)
        .select("start", "end", "events", "total_value").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getInt(2),
          r.getDouble(3))).toSet
      val want = StreamOps.sessionizeBatch(Seq(
          Event(0, ts(720), 7, "a", 1.0), Event(1, ts(670), 7, "b", 2.0),
          Event(2, ts(675), 7, "c", 3.0)).toDF())
        .select("start", "end", "events", "total_value").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getInt(2),
          r.getDouble(3))).toSet
      assert(got == want && got.size == 2)
    } finally q.stop()
  }

  test("streaming dedup keeps exactly one doc per fingerprint (== batch)") {
    import spark.implicits._
    import graft.streaming.StreamOps.Doc
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(0, ts(10), "alpha beta"), Doc(1, ts(11), "gamma"),
      Doc(2, ts(12), "alpha beta"), // dup of 0, same batch
      Doc(3, ts(40), "ALPHA BETA"), // dup modulo normalization
      Doc(4, ts(41), "delta"), Doc(5, ts(42), "gamma")) // cross-batch dup
    val mem = MemoryStream[Doc]
    val q = StreamOps.dedupByFingerprint(mem.toDF())
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(3): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("dedup_t").select("fp").collect()
        .map(_.getString(0)).toSeq
      val want = StreamOps.dedupByFingerprint(docs.toDF())
        .select("fp").collect().map(_.getString(0)).toSeq
      assert(got.sorted == want.sorted)
      assert(got.length == got.distinct.length) // one survivor per fp
      assert(got.length == 3) // alpha-beta (normalized), gamma, delta
    } finally q.stop()
  }

  test("streaming decontamination == batch filter == q73 flagging") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 97 =!= 0)
    // eval grams exactly as q73 builds them (tiny by contract)
    val benchGrams = operators.TextOps.gram5Stream(spark, sfDir)
      .filter(col("doc_id") % 97 === 0)
      .select("g").distinct().collect().map(_.getString(0)).toSeq
    // batch run of the SAME per-row predicate
    val keptBatch = streaming.StreamOps.decontaminate(train, benchGrams)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // agreement with the broadcast-join report: kept == train - flagged
    val flagged = operators.TextOps.queries("q73_decontaminate")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptBatch == trainIds -- flagged && keptBatch.nonEmpty)
    // the same rows through a stream: identical survivors, no state
    val mem = MemoryStream[(Long, String)]
    val q = streaming.StreamOps.decontaminate(
        mem.toDF().toDF("doc_id", "text"), benchGrams)
      .writeStream.format("memory").queryName("decon_t")
      .outputMode("append").start()
    try {
      mem.addData(train.as[(Long, String)].collect().toIndexedSeq: _*)
      q.processAllAvailable()
      val gotStream = spark.table("decon_t").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(gotStream == keptBatch)
    } finally q.stop()
  }

  test("stream-static enrichment join == batch join, unmatched facts kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    def run(df: org.apache.spark.sql.DataFrame) =
      StreamOps.enrich(df, dim, "user_id")
        .select("event_id", "user_id", "tier")
    val want = run(sample.toDF()).collect().map(_.toSeq).toSet
    val mem = MemoryStream[Event]
    val q = run(mem.toDF())
      .writeStream.format("memory").queryName("enrich_t")
      .outputMode("append").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val got = spark.table("enrich_t").collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
      // user 9 has no dim row in later batches — left join keeps it
      mem.addData(Event(50, ts(200), 9, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("enrich_t").collect()
        .exists(r => r.getLong(1) == 9L && r.isNullAt(2)))
    } finally q.stop()
  }

  test("context-window chunking runs unchanged on a stream (== batch)") {
    // q74's chunking is pure narrow ops (sequence + explode + slice) —
    // the SAME transformation chunks documents at ingestion time with
    // zero state; pin that the plan really is stream-admissible
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq((1L, "a b c"), (2L, (1 to 150).map(i => s"t$i").mkString(" ")))
    def chunk(df: org.apache.spark.sql.DataFrame) = {
      val W = 64; val S = 48
      df.select(col("doc_id"),
          graft.operators.TextOps.tokens(col("text")).as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("i", explode(sequence(lit(0),
          floor((col("n") - 1) / lit(S)).cast("int"))))
        .select(col("doc_id"), col("i"),
          least(lit(W), col("n") - col("i") * S).as("chunk_len"))
    }
    val want = chunk(docs.toDF("doc_id", "text"))
      .collect().map(_.toSeq).toSet
    val mem = MemoryStream[(Long, String)]
    val q = chunk(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_t")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("chunk_t").collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join == batch interval join (q87 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // views at t=10 (user 2), t=135 (user 2); purchases land inside /
    // outside the 30-min attribution window across users
    val purchases: Seq[Event] = Seq(
      Event(10, ts(20), 2, "purchase", 9.0),  // 10 min after view -> match
      Event(11, ts(41), 2, "purchase", 9.5),  // 31 min after view -> no
      Event(12, ts(140), 2, "purchase", 1.0), // 5 min after 2nd view -> match
      Event(13, ts(15), 1, "purchase", 2.0))  // user 1 never views -> no
    val views = sample.filter(_.event_type == "view")
    val want = StreamOps.viewPurchaseJoin(
        views.toDF(), purchases.toDF())
      .collect().map(_.toSeq).toSet
    val (vMem, pMem) = (MemoryStream[Event], MemoryStream[Event])
    val q = StreamOps.viewPurchaseJoin(vMem.toDF(), pMem.toDF())
      .writeStream.format("memory").queryName("vp_join")
      .outputMode("append").start()
    try {
      vMem.addData(views: _*)
      pMem.addData(purchases: _*)
      q.processAllAvailable()
      val got = spark.table("vp_join").collect().map(_.toSeq).toSet
      assert(got == want && got.size == 2)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched views flush " +
      "at the watermark and match the batch twin (q245 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one matching purchase for user 2's first view; every other view
    // must still emit — with a NULL p_ts — once the watermark passes
    // its whole match window
    val purchases: Seq[Event] = Seq(Event(10, ts(20), 2, "purchase", 9.0))
    val views = sample.filter(_.event_type == "view")
    val want = StreamOps.viewPurchaseJoinOuter(
        views.toDF(), purchases.toDF())
      .collect().map(_.toSeq).toSet
    assert(want.exists(_.last == null), "batch twin must have outer rows")
    val (vMem, pMem) = (MemoryStream[Event], MemoryStream[Event])
    val q = StreamOps.viewPurchaseJoinOuter(vMem.toDF(), pMem.toDF())
      .writeStream.format("memory").queryName("vp_outer")
      .outputMode("append").start()
    try {
      vMem.addData(views: _*)
      pMem.addData(purchases: _*)
      q.processAllAvailable()
      // outer rows release only when the watermark passes the view's
      // window: feed a far-future flush through BOTH sides (the q245
      // gate's sentinel), twice — the watermark computed from batch k
      // evicts in batch k+1
      Seq(100000, 100001).foreach { t =>
        vMem.addData(Event(-1, ts(t), -1, "flush", 0.0))
        pMem.addData(Event(-1, ts(t), -1, "flush", 0.0))
        q.processAllAvailable()
      }
      val got = spark.table("vp_outer").collect().map(_.toSeq)
        .filter(_.head.asInstanceOf[Long] >= 0).toSet
      assert(got == want, s"stream $got != batch $want")
      assert(got.exists(_.last == null), "an unmatched view must emit")
    } finally q.stop()
  }

  test("checkpointed file sink: restart resumes exactly-once (no dup, no loss)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the recovery contract 100TB ingestion rests on: a sink fed via a
    // checkpoint can be stopped and a NEW query resumed from the same
    // checkpoint without duplicating or losing rows
    val root = java.nio.file.Files
      .createTempDirectory("graft-restart").toString
    val (ckpt, out) = (s"$root/ckpt", s"$root/out")
    def start(mem: MemoryStream[Event]) =
      mem.toDF().writeStream.format("parquet")
        .option("checkpointLocation", ckpt).option("path", out)
        .outputMode("append").start()
    val mem = MemoryStream[Event]
    val q1 = start(mem)
    try { mem.addData(sample.take(4): _*); q1.processAllAvailable() }
    finally q1.stop()
    mem.addData(sample.drop(4): _*) // lands AFTER the stop
    val q2 = start(mem) // new query, same checkpoint
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == sample.map(_.event_id).sorted.toSeq)
  }

  test("streaming IVF ingestion: streamed vectors searchable on reload (== batch insert)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.index.IvfFlat
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-ingest").toString
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // build on a prefix, stream the rest in two micro-batches
    val model = IvfFlat.build(emb.filter(col("vec_id") < 300),
      Seq("vec_id"), "v", lists = 8, probeLists = 8)
    model.save(dir)
    val rest = emb.filter(col("vec_id") >= 300)
      .as[(Long, Array[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Array[Double])]
    val q = StreamOps.ivfIngest(mem.toDF().toDF("vec_id", "v"),
        model)
      .writeStream.format("parquet")
      .option("path", dir + "/stream")
      .option("checkpointLocation", dir + "/cp")
      .partitionBy("__bucket").start()
    try {
      val (a, b) = rest.splitAt(rest.size / 2)
      mem.addData(a: _*); q.processAllAvailable()
      mem.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    val loaded = IvfFlat.load(spark, dir)
    val query = emb.filter(col("vec_id") === 7)
      .select("v").head().getSeq[Double](0)
    // probe-all ⇒ exact: the streamed rows must be indistinguishable
    // from a batch IvfFlatModel.insert of the same rows
    val got = loaded.scan(query, 15, Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val want = model.insert(rest.toDF("vec_id", "v"))
      .scan(query, 15, Some("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == want && got.size == 15)
  }

  test("batch sessionization on the events table: sane invariants") {
    val events = Tables.load(spark, sfDir, "events")
    val sessions = StreamOps.sessionizeBatch(events)
    val n = events.count()
    val agg = sessions.agg(sum("events"), count(lit(1))).head()
    assert(agg.getLong(0) == n) // every event in exactly one session
    // session bounds ordered
    assert(sessions.filter(col("end") < col("start")).isEmpty)
  }

  test("q162 hop-window stream gate: every window flushes and matches batch") {
    val r = graft.operators.StreamGateOps
      .queries("q162_stream_hop_gate")(spark, sfDir).head()
    assert(r.getAs[Boolean]("stream_eq_batch"),
      "watermarked stream windows must equal the batch twin")
    // each event lands in exactly 2 hops
    val n = Tables.load(spark, sfDir, "events").count()
    assert(r.getAs[Long]("events_total") == 2 * n)
  }

  test("q178 idempotency gate: a checkpointed re-run appends nothing") {
    val r = graft.operators.StreamGateOps
      .queries("q178_stream_idempotent_gate")(spark, sfDir).head()
    assert(r.getAs[Boolean]("exactly_once"), r.toString)
    assert(r.getAs[Long]("after_first_run")
      == r.getAs[Long]("after_second_run"))
  }

  test("q170 late-data gate: watermark drops every planted late row") {
    val r = graft.operators.StreamGateOps
      .queries("q170_stream_late_gate")(spark, sfDir).head()
    assert(r.getAs[Boolean]("all_late_dropped"), r.toString)
    assert(r.getAs[Long]("late_in_sink") == 0)
    assert(r.getAs[Long]("events_in_sink") == r.getAs[Long]("n_events"))
  }

  test("q234 stream LSH gate: cross-batch planted dups make the " +
      "bucket store load-bearing; incremental == global rule") {
    import spark.implicits._
    import java.nio.file.Files
    // 200 docs in 8 id-range slabs of 25; doc i and i+100 carry
    // IDENTICAL text (identical shingles -> identical 16 band keys),
    // so every planted conflict crosses a micro-batch boundary and
    // must be caught by the PERSISTENT store, not batch-local dedup.
    // A store that forgot dropped docs' buckets, or read after its
    // own append, would break the in-engine equivalence flag.
    val dir = Files.createTempDirectory("lsh_gate_fixture_").toFile
    (0L until 200L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta d${i % 100}"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.getAbsolutePath + "/documents.parquet")
    val r = operators.StreamGateOps
      .queries("q234_stream_lsh_gate")(spark, dir.getAbsolutePath)
      .head()
    assert(r.getAs[Long]("n_docs") == 200L)
    assert(r.getAs[Long]("missed") == 0L, r.toString)
    assert(r.getAs[Long]("extra") == 0L, r.toString)
    assert(r.getAs[Boolean]("stream_eq_batch"))
    Util.deleteRecursively(dir)
  }

  test("q234 stream LSH gate holds on the test corpus") {
    val r = operators.StreamGateOps
      .queries("q234_stream_lsh_gate")(spark, sfDir).head()
    assert(r.getAs[Boolean]("stream_eq_batch"), r.toString)
    assert(r.getAs[Long]("missed") == 0L && r.getAs[Long]("extra") == 0L)
  }

  test("q289 streaming as-of: late view across batches still wins; " +
      "watermark gates emission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamOps.asofJoin(mem.toDS())
      .writeStream.format("memory").queryName("asof_t")
      .outputMode("append").start()
    try {
      // batch 1: a view and a trade for user 1, a view-less trade
      // for user 2
      mem.addData(
        Event(0, ts(10), 1, "view", 0.0),
        Event(1, ts(20), 1, "purchase", 5.0),
        Event(2, ts(15), 2, "purchase", 7.0))
      q.processAllAvailable()
      // batch 2: an OLDER view for user 1 (t5 — must NOT displace
      // the t10 match for the t20 trade) + a newer view and trade
      mem.addData(
        Event(3, ts(5), 1, "view", 0.0),
        Event(4, ts(25), 1, "view", 0.0),
        Event(5, ts(30), 1, "purchase", 9.0))
      q.processAllAvailable()
      // watermark is still below every trade: nothing may emit yet —
      // a state machine that answered from "latest view so far"
      // instead of buffering would already have emitted (1, e1, e0)
      assert(spark.table("asof_t").count() == 0)
      // sentinel advances the watermark past everything
      mem.addData(Event(6, ts(600), -1, "zz_flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_t")
        .select("user_id", "t_eid", "v_eid", "lag_us")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(got == Set(
        (1L, 1L, 0L, 10L * 60 * 1000000), // t20 -> view t10 (NOT t5)
        (1L, 5L, 4L, 5L * 60 * 1000000), // t30 -> view t25
        (2L, 2L, -1L, -1L))) // no view for user 2
      // batch twin agrees row-for-row on the same (non-sentinel) data
      val events = Seq(
        Event(0, ts(10), 1, "view", 0.0),
        Event(1, ts(20), 1, "purchase", 5.0),
        Event(2, ts(15), 2, "purchase", 7.0),
        Event(3, ts(5), 1, "view", 0.0),
        Event(4, ts(25), 1, "view", 0.0),
        Event(5, ts(30), 1, "purchase", 9.0)).toDF()
      val batch = StreamOps.asofJoinBatch(events)
        .select("user_id", "t_eid", "v_eid", "lag_us")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("q289 as-of tie-break: view at the trade's exact ts matches; " +
      "equal-ts views pick the higher event_id") {
    import spark.implicits._
    val events = Seq(
      Event(10, ts(20), 1, "view", 0.0),
      Event(11, ts(20), 1, "view", 0.0), // same ts, higher id wins
      Event(12, ts(20), 1, "purchase", 1.0), // inclusive <=
      Event(13, ts(19), 2, "view", 0.0),
      Event(14, ts(21), 2, "view", 0.0), // after the trade: excluded
      Event(15, ts(20), 2, "purchase", 2.0)).toDF()
    val got = StreamOps.asofJoinBatch(events)
      .select("t_eid", "v_eid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((12L, 11L), (15L, 13L)))
  }
}
