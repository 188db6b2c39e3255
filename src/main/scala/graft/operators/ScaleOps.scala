package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomSemi

import graft.Tables

/** Data-layout and sketch operators — the 100TB surface where the WIN
  * comes from how bytes are laid out / summarized, not from the query:
  *
  *  - bucketed co-located join (q83): pre-shuffle ONCE at write time,
  *    then every join on the bucket key runs with ZERO exchanges —
  *    at 100TB the difference between re-shuffling the fact table per
  *    query and never shuffling it again.
  *  - date-partitioned layout + partition pruning (q84): the standard
  *    time-series layout; a day's query reads one directory, not the
  *    corpus (PlanShapeSpec asserts PartitionFilters).
  *  - bloom-filter semi-join (q85): runtime-filter pattern for a dim
  *    too big to broadcast exactly — distributed sketch build, map-side
  *    codegen probe BEFORE the fact shuffle, exact verify after.
  *  - mergeable sketches (q82 HLL + quantile, q92 count-min): only
  *    fixed-size sketch state moves between executors, never raw
  *    values; every sketch gated against the exact answer.
  *  - small-file compaction (q97): the lake-maintenance rewrite,
  *    content value-checked.
  *  - interval (event-time window) join (q87): the batch twin of the
  *    stream-stream attribution join in StreamOps; pivot/crosstab
  *    (q95), INTERSECT/EXCEPT (q96), and per-user timeline assembly
  *    (q101) round out the reshaping surface.
  *
  * The reference has none of these (single-node course engine) — this
  * is beyond-parity scale surface per SURVEY.md §7.4, same tier as the
  * dedup/ANN north star.
  */
object ScaleOps {

  type Q = (SparkSession, String) => DataFrame

  /** Row cutoff for the RUNTIME broadcast gates on node-sized tables
    * in the iterative loops (PageRank/PPR rank rounds, LPA labels,
    * HITS scores, the triangle/wedge degree attaches). An explicit
    * `broadcast()` hint bypasses `autoBroadcastJoinThreshold`, and the
    * hashed relation it builds costs roughly `rowBytes` of payload
    * plus ~80B of object/array overhead per row — and is REBUILT every
    * round of the iterative loops — so a fixed 10M-row cutoff that
    * never looks at the driver heap is an OOM cliff just under the
    * threshold (r12 advice). Derived instead from the JVM max heap:
    * the hinted relation may use at most ~1/16th of it (two copies
    * briefly coexist across round boundaries, and the driver carries
    * its own scheduler/UI state besides), clamped to [500k, 10M] —
    * small test heaps must still broadcast the specs' graphs, and a
    * giant heap must still co-partition past 10M rows because the
    * per-round relation REBUILD cost grows with rows regardless of
    * whether the bytes fit. */
  private[graft] def broadcastRowLimit(rowBytes: Long): Long = {
    val relationBudget = Runtime.getRuntime.maxMemory() / 16
    math.min(10000000L,
      math.max(500000L, relationBudget / (rowBytes + 80)))
  }

  private def scratch(d: String): String = Tables.scratchDir(d)

  /** Columns the q175 profile covers — one list drives both the Spark
    * aggregation and the generated per-column oracle UNION. */
  private val ProfileCols = Seq("c_custkey", "c_name", "c_nationkey",
    "c_mktsegment", "c_acctbal")
  private def key(d: String): String = Tables.dirKey(d)

  /** Write orders+lineitem bucketed by the join key (8 buckets, sorted
    * within) and return the co-located join — SortMergeJoin with ZERO
    * Exchange under it (PlanShapeSpec asserts). The write is the
    * one-time layout cost; every subsequent join on the key is
    * shuffle-free. The `merge` hint pins SMJ so the demonstration
    * doesn't silently degrade to broadcast at small SF. */
  private[graft] def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (oT, lT) = (s"graft_ob_${key(d)}", s"graft_lb_${key(d)}")
    if (!s.catalog.tableExists(oT)) // build once, join many
      Tables.load(s, d, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"${scratch(d)}/$oT").saveAsTable(oT)
    if (!s.catalog.tableExists(lT))
      Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"${scratch(d)}/$lT").saveAsTable(lT)
    s.table(oT).hint("merge")
      .join(s.table(lT), col("o_orderkey") === col("l_orderkey"))
  }

  /** The date-partitioned copy of `events` + the pruned scan of ONE
    * day (min date + 1). Split out so PlanShapeSpec can assert the
    * PartitionFilters on the scan. */
  private[graft] def prunedDayScan(s: SparkSession, d: String): DataFrame = {
    val root = s"${scratch(d)}/events_by_date"
    val ev = Tables.load(s, d, "events")
    // lay out once, prune many — but SELF-INVALIDATING: a regenerated
    // events.parquet must force a re-layout, not serve the old copy
    val fsRoot = new org.apache.hadoop.fs.Path(root)
    val fsG = fsRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
    ScratchGuard.ensure(s, root, ev)(
      fsG.exists(new org.apache.hadoop.fs.Path(s"$root/_SUCCESS"))) {
      ev.withColumn("event_date", to_date(col("ts")).cast("string"))
        .write.mode(SaveMode.Overwrite).partitionBy("event_date").parquet(root)
    }
    // one tiny driver-side scalar (the target day) so the filter is a
    // LITERAL -> static partition pruning at planning time
    val target = ev.agg(date_add(min(to_date(col("ts"))), 1)).head.getDate(0)
    s.read.parquet(root).filter(col("event_date") === lit(target.toString))
  }

  /** The bloom-prefiltered fact side of q85, split out so the spec can
    * assert the codegen `might_contain` probe and measure the prune. */
  private[graft] def bloomPrunedFact(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.load(s, d, "orders")
      .filter(col("o_totalprice") > 450000).select("o_orderkey")
    // distributed build: only fixed-size bitmaps merge; sized for the
    // dim at 100x this SF (bloom size is O(items), not O(fact))
    val bloom = BloomSemi.build(dim, col("o_orderkey"), 100000L)
    Tables.load(s, d, "lineitem")
      .filter(BloomSemi.mightContain(bloom, col("l_orderkey")))
  }

  /** Fixed-point PageRank over an undirected (src, dst) edge frame —
    * BIGINT ranks in 1e-10 units, every step integer arithmetic, so
    * the recurrence is bit-identical across engines and rounds (float
    * sums differ between engines at the 10th digit over thousands of
    * contributions). Damping 0.85 as `85*(acc div 100) + (85*(acc%100))
    * div 100` — algebraically identical to `(85*acc) div 100` for
    * non-negative acc but the multiply operates on acc/100, raising
    * the LONG-overflow bound from ~1e7 hub-concentrated nodes to ~1e9
    * (total mass is N*1e10 fixed-point units; the oracle's HUGEINT
    * never wraps, so overflow here would be a silent cross-engine
    * divergence). Beyond ~1e9 nodes, drop to 1e-8-unit fixed point.
    *
    * Two propagation shapes, chosen by node count at runtime:
    * - BROADCAST (node table fits executors): each round is one
    *   node-sized broadcast + one map-side-combined exchange on dst;
    *   the edge list is never shuffled after the degree attach.
    * - CO-PARTITIONED (node table outgrows broadcast): the edge list
    *   is hash-partitioned on src ONCE and cached; each round's ranks
    *   arrive partitioned on node from the previous round's groupBy,
    *   so the join reuses both partitionings and only the node-sized
    *   rank frame ever moves. ScaleOpsSpec pins rank parity between
    *   the two shapes on the same graph.
    *
    * Ranks are localCheckpoint'ed EAGERLY each round (the dupLabels
    * discipline): without it every action replays the whole join
    * chain — unbounded lineage at scale. Every node has degree >= 1 by
    * construction (edges are undirected), so no dangling-mass term. */
  private[graft] def pageRankFixedPoint(edges: DataFrame, rounds: Int,
      forceCoPartition: Option[Boolean] = None): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(deg, "src")
    // heap-derived cutoff: (node, rank) rows are 16B of payload
    val BroadcastNodeLimit = broadcastRowLimit(16)
    // one bounded scalar job (node count) picks the shape — the same
    // runtime-statistics re-plan AQE does for join strategies
    val coPart = forceCoPartition.getOrElse(deg.count() > BroadcastNodeLimit)
    var ranks = deg.select(col("src").as("node"),
      lit(10000000000L).as("r_fp")) // 1.0 in 1e-10 fixed point
    val edgesCached =
      (if (coPart) edgesDeg.repartition(col("src")) else edgesDeg).cache()
    for (_ <- 1 to rounds) {
      val joined =
        if (coPart) edgesCached.join(ranks, col("src") === col("node"))
        else edgesCached.join(broadcast(ranks), col("src") === col("node"))
      ranks = joined
        .groupBy(col("dst"))
        .agg(sum(expr("r_fp div deg")).as("acc"))
        .select(col("dst").as("node"),
          (lit(1500000000L) +
            expr("85 * (acc div 100) + (85 * (acc % 100)) div 100"))
            .as("r_fp"))
        .localCheckpoint() // eager: truncate lineage per round
    }
    ranks
  }

  /** q286's personalized PageRank: [[pageRankFixedPoint]]'s exact
    * BIGINT fixed-point recurrence with the uniform restart vector
    * replaced by a SEED-concentrated one — r(v) = (1−d)·s(v) +
    * d·Σ r(u)/deg(u), s(v) = 1/|S| on the seed set, 0 elsewhere.
    * The crawl-frontier/"related entities" primitive: mass stays in
    * the seeds' neighborhoods instead of spreading globally. Same
    * scale shape as PR (per round: one broadcast-or-co-partitioned
    * join + one map-side-combined agg), seeds ride a broadcast left
    * join; all arithmetic integral (floor division everywhere, both
    * engines). */
  private[graft] def pprFixedPoint(edges: DataFrame, seeds: DataFrame,
      rounds: Int,
      forceCoPartition: Option[Boolean] = None): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.join(deg, "src")
    val nSeeds = seeds.count()
    require(nSeeds > 0, "ppr: empty seed set")
    val seedShare = 10000000000L / nSeeds // 1.0 split across seeds
    val restart = 15L * seedShare / 100
    val seedFlag = broadcast(
      seeds.select(col("node").as("s_node"), lit(1).as("is_seed")))
    // the same runtime shape switch as pageRankFixedPoint: past
    // comfortable broadcast, co-partition edges once and let every
    // round's rank join ride the cached partitioning
    val BroadcastNodeLimit = broadcastRowLimit(16)
    val coPart =
      forceCoPartition.getOrElse(deg.count() > BroadcastNodeLimit)
    var ranks = deg.select(col("src").as("node"))
      .join(seedFlag, col("node") === col("s_node"), "left")
      .select(col("node"),
        when(col("is_seed").isNotNull, lit(seedShare))
          .otherwise(lit(0L)).as("r_fp"))
    val edgesCached =
      (if (coPart) edgesDeg.repartition(col("src")) else edgesDeg).cache()
    for (_ <- 1 to rounds) {
      val joined =
        if (coPart) edgesCached.join(ranks, col("src") === col("node"))
        else edgesCached.join(broadcast(ranks), col("src") === col("node"))
      ranks = joined
        .groupBy(col("dst"))
        .agg(sum(expr("r_fp div deg")).as("acc"))
        .join(seedFlag, col("dst") === col("s_node"), "left")
        .select(col("dst").as("node"),
          (when(col("is_seed").isNotNull, lit(restart)).otherwise(lit(0L))
            + expr("85 * (acc div 100) + (85 * (acc % 100)) div 100"))
            .as("r_fp"))
        .localCheckpoint() // eager: truncate lineage per round
    }
    edgesCached.unpersist()
    ranks
  }

  val queries: Map[String, Q] = Map(
    // k-anonymity audit — the privacy release gate run before a
    // dataset ships: group by the quasi-identifier tuple (nation,
    // segment, account-balance band = one generalization level) and
    // report the anonymity parameter k (min class size) plus how many
    // classes/rows sit below the k=5 re-identification threshold
    // (the rows a release would suppress or generalize further).
    // Complements q146's PII redaction: scrubbing direct identifiers
    // without checking quasi-identifier uniqueness is how "anonymized"
    // sets get re-identified. Shape: two partial+final aggs, class
    // rows only ever shuffle as (qid-tuple, count) — never the data.
    "q148_k_anonymity" -> ((s, d) => {
      val qid = Tables.load(s, d, "customer").select(
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        (floor(col("c_acctbal") / 1000.0) * 1000).cast("long")
          .as("bal_band"))
      qid.groupBy("nat", "seg", "bal_band")
        .agg(count(lit(1)).as("k"))
        .agg(min("k").as("k_min"),
          count(lit(1)).as("n_classes"),
          sum("k").as("n_rows"),
          sum(when(col("k") < 5, 1L).otherwise(0L)).as("classes_lt5"),
          sum(when(col("k") < 5, col("k")).otherwise(0L))
            .as("rows_at_risk"))
    }),

    // Mergeable-sketch gate: HLL distinct (rsd 2%) and a quantile
    // sketch (accuracy 10k), each checked in-engine against the exact
    // answer; the driver-visible columns are the exact count + the
    // gate booleans. At 100TB the sketches are the only option — the
    // exact twins here are the correctness pin at test scale.
    "q82_hll_sketch" -> ((s, d) => {
      Tables.load(s, d, "events")
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95_approx"),
          percentile(col("value"), lit(0.90)).as("p90"),
          percentile(col("value"), lit(0.99)).as("p99"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= greatest(col("exact_users") * 0.05, lit(1.0))).as("hll_ok"),
          (col("p95_approx") >= col("p90")
            && col("p95_approx") <= col("p99")).as("q_ok"))
    }),

    // HLL sketch ROLL-UP — the re-aggregation property that makes
    // sketches the 100TB pre-aggregation layer (q82 only builds one
    // level): per-(type, day) DataSketches HLL built in one pass, then
    // the per-type count is the UNION of the stored day sketches — no
    // return to raw data. That is how a materialized daily rollup
    // answers weekly/monthly distinct-count questions at any scale:
    // only fixed-size sketch blobs are stored, shuffled, and merged.
    // Gated against the exact distinct count (lgK=12 on user-scale
    // cardinalities is near-exact; 5%+1 tolerance).
    "q114_hll_rollup" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"))
      val daily = ev.groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val rolled = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      rolled.join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("est") - col("exact_users"))
            <= greatest(col("exact_users") * 0.05, lit(1.0)))
            .as("rollup_ok"))
    }),

    // Count-min-sketch heavy hitters: token frequencies estimated from
    // a CMS built DISTRIBUTED (mergeable partial sketches — fixed
    // eps×delta grid per executor, never token rows), probed for the
    // exact top-20 tokens. CMS guarantees est >= exact always and
    // est <= exact + eps*N w.h.p. — both emitted as driver-checkable
    // gate booleans next to the exact counts. The third mergeable
    // sketch next to q82's HLL + quantile digest.
    "q92_cms_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.load(s, d, "documents")
        .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
      toks.cache() // three actions below share ONE tokenize+scan pass
      try {
        val eps = 0.0001
        // depth from CONFIDENCE 0.99 (7 hash rows) — the w.h.p. bound
        // is meaningless at depth 1
        val cms = toks.stat.countMinSketch(col("t"), eps, 0.99, 42)
        val n = toks.count()
        val top = toks.groupBy("t").agg(count(lit(1)).as("exact"))
          .orderBy(col("exact").desc, col("t").asc).limit(20)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        top.toSeq.map { case (t, exact) =>
          val est = cms.estimateCount(t)
          (t, exact, est >= exact && est <= exact + (eps * n).toLong)
        }.toDF("t", "exact", "cms_ok")
      } finally toks.unpersist()
    }),

    // Bucketed co-located join: revenue per order priority off the
    // bucketed layout — same answer as the plain-parquet join, zero
    // exchanges under the join (asserted in PlanShapeSpec).
    "q83_bucketed_join" -> ((s, d) => {
      bucketedJoin(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"))
    }),

    // Salted-join twin of q83 — the explicit hot-key mitigation
    // (SkewOps.saltedInnerJoin: probe side salted into 8 buckets,
    // build side replicated once per salt, join on (key, salt)) must
    // produce the IDENTICAL result set as the plain equi-join; sharing
    // q83's DuckDB oracle pins that end-to-end, while SkewSpec pins
    // row identity + salt distribution on adversarial skew. The shape
    // that saves a 100TB join when one key dwarfs everything and AQE's
    // partition splitting isn't enough.
    "q144_salted_join" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_extendedprice"), col("l_discount"))
      val o = Tables.load(s, d, "orders")
        .select("o_orderkey", "o_orderpriority")
      SkewOps.saltedInnerJoin(li, o, "o_orderkey", buckets = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"))
    }),

    // Date-partitioned layout: write once partitioned by day, then a
    // single-day query reads ONE partition directory (PartitionFilters
    // asserted) — the layout that turns a 100TB scan into a 300GB one.
    "q84_date_partition_prune" -> ((s, d) => {
      prunedDayScan(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
    }),

    // Bloom semi-join: map-side sketch probe prunes the fact BEFORE
    // its shuffle; the exact semi-join afterwards only pays for
    // survivors (matches + ~fpp false positives). Result is exact.
    "q85_bloom_semi_join" -> ((s, d) => {
      val dim = Tables.load(s, d, "orders")
        .filter(col("o_totalprice") > 450000).select("o_orderkey")
      bloomPrunedFact(s, d)
        .join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("qty"))
    }),

    // Small-file compaction — the table-maintenance op every
    // long-lived lake needs: a fragmented dataset (64 shards here,
    // simulating streaming/appends) rewritten into a handful of
    // right-sized files. Content preservation is the VALUE-checked
    // part (row count + decimal key checksum vs the original table);
    // the file-count collapse is the in-engine gate. At scale this is
    // one distributed read + shuffle-free coalesce write per
    // partition-directory, scheduled partition-by-partition.
    // CDC MERGE (upsert + delete) — the incremental table-maintenance
    // primitive (Delta/Iceberg MERGE INTO), in the shape that scales:
    // the change batch is small and its TOUCHED-KEY set broadcasts, so
    // the 100TB base is only ever streamed map-side through one
    // broadcast anti-join (drop updated+deleted keys) and one union
    // with the surviving change rows — the base never shuffles, and
    // there is no full-outer join. Change batch is derived
    // deterministically from the table (updates: %7 keys get
    // n_chars+1; deletes: %13 keys; inserts: id-offset %10 copies) so
    // DuckDB recomputes the merged state independently; gate is the
    // per-source reconciliation report with id checksums.
    "q140_merge_upsert" -> ((s, d) => {
      val base = Tables.load(s, d, "documents")
        .select("doc_id", "n_chars", "source")
      // disjoint change classes: delete beats update on overlap keys
      val updates = base
        .filter(col("doc_id") % 7 === 0 && col("doc_id") % 13 =!= 0)
        .select(col("doc_id"), (col("n_chars") + 1L).as("n_chars"),
          col("source"))
      val inserts = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("n_chars"),
          col("source"))
      val touched = base
        .filter(col("doc_id") % 7 === 0 || col("doc_id") % 13 === 0)
        .select("doc_id")
      val merged = base
        .join(broadcast(touched), Seq("doc_id"), "left_anti")
        .unionAll(updates).unionAll(inserts)
      merged.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars_total"),
          expr("bit_xor(doc_id)").as("id_xor"))
    }),

    // MANIFEST-based snapshot reads — the lakehouse time-travel
    // primitive (Iceberg/Delta's core), reduced to its Spark-native
    // mechanics: a version is an immutable LIST OF FILES (manifest);
    // appends write new files plus a new manifest and never rewrite
    // data; a snapshot read plans exactly the manifest's files. The
    // gate reads BOTH versions after the append exists and pins each
    // against the source-table recomputation (count + char volume +
    // order-invariant id checksum) — proving v1 stays byte-stable
    // while v2 files sit in the same tree, which is the property that
    // makes concurrent readers safe without locks at 100TB.
    "q139_snapshot_read" -> ((s, d) => {
      val snap = ensureSnapshots(s, d)
      def row(v: Int) = snap(v)
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("chars_total"),
          expr("bit_xor(doc_id)").as("id_xor"))
        .select(lit(v).as("version"), col("n_docs"),
          col("chars_total"), col("id_xor"))
      row(1).unionAll(row(2))
    }),

    "q97_compact" -> ((s, d) => {
      import s.implicits._
      val frag = s"${scratch(d)}/lineitem_fragmented"
      val compact = s"${scratch(d)}/lineitem_compacted"
      val li = Tables.load(s, d, "lineitem")
      li.repartition(64).write.mode(SaveMode.Overwrite).parquet(frag)
      // Hadoop FS listing, not java.io — works against any filesystem
      // the cluster writes to (HDFS/object store), not just local
      def nFiles(p: String): Long = {
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(s.sparkContext.hadoopConfiguration)
          .listStatus(path).count(_.getPath.getName.startsWith("part-"))
          .toLong
      }
      val before = nFiles(frag)
      // coalesce = NO shuffle: shards merge within their executors
      s.read.parquet(frag).coalesce(4)
        .write.mode(SaveMode.Overwrite).parquet(compact)
      val after = nFiles(compact)
      val out = s.read.parquet(compact)
      out.agg(
        count(lit(1)).as("rows"),
        sum(col("l_orderkey").cast("decimal(28,0)")).cast("long")
          .as("key_sum"))
        .withColumn("files_collapsed",
          lit(before >= 64 && after <= 4))
    }),

    // Pivot / crosstab: per-source × language doc counts — the
    // wide-report reshape. Explicit pivot values keep the output
    // schema STATIC (a values-less pivot runs a distinct scan first
    // and breaks schema stability at 100TB); absent cells filled 0.
    // One partial+final agg on (source, lang) then a narrow reshape.
    "q95_pivot" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .groupBy("source")
        .pivot("lang", Seq("en", "de", "es", "fr", "zh"))
        .count()
        .na.fill(0L)
    }),

    // Set operations INTERSECT / EXCEPT (distinct semantics), compact
    // scalar report: order keys both returned AND fully shipped vs
    // returned-only. Spark plans these as aggregate + left-semi/anti —
    // shuffle on the key, no driver-side sets.
    "q96_setops" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
      val a = li.filter(col("l_returnflag") === "R").select("l_orderkey")
      val b = li.filter(col("l_linestatus") === "F").select("l_orderkey")
      val inter = a.intersect(b)
      val diff = a.except(b)
      inter.agg(count(lit(1)).as("inter_n"),
          min("l_orderkey").as("inter_min"), max("l_orderkey").as("inter_max"))
        .crossJoin(diff.agg(count(lit(1)).as("except_n")))
    }),

    // Per-user timeline assembly — the "session transcript" builder
    // for behavioral/SFT training data: each user's full event stream
    // ordered by time, fingerprinted. Elements are zero-padded so
    // LEXICOGRAPHIC order == numeric (ts, event_id) order, which makes
    // sort_array + md5 deterministic and CROSS-ENGINE checkable with
    // no reliance on shuffle arrival order (collect_list alone is
    // order-nondeterministic — the classic trap). One shuffle; per-user
    // state bounded by that user's activity, the natural key at scale.
    "q101_user_timeline" -> ((s, d) => {
      val el = concat_ws(":",
        lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
        lpad(col("event_id").cast("string"), 10, "0"),
        col("event_type"))
      Tables.load(s, d, "events")
        .select(col("user_id"), el.as("el"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          md5(concat_ws("|", sort_array(collect_list(col("el"))))
            .cast("binary")).as("timeline_fp"))
    }),

    // Incremental rollup maintenance (the materialized-view merge):
    // per-source stats computed INDEPENDENTLY over the existing corpus
    // and a new batch, then merged by re-aggregating the two partial
    // states — count/sum/min/max are mergeable, avg derives from the
    // merged sums. The 100TB point: admitting a batch updates the
    // rollup from fixed-size partial state (never re-scanning the
    // corpus; here both sides scan only because the "corpus rollup"
    // has to be produced in the same query). The DuckDB oracle
    // computes the DIRECT full-corpus rollup, so merged == recomputed
    // is the value check.
    "q108_merge_rollup" -> ((s, d) => {
      def part(df: DataFrame) = df.groupBy("source").agg(
        count(lit(1)).as("docs"), sum("n_chars").as("chars"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      val docs = Tables.load(s, d, "documents")
      part(docs.filter(col("doc_id") % 10 =!= 0))
        .unionByName(part(docs.filter(col("doc_id") % 10 === 0)))
        .groupBy("source").agg(
          sum("docs").as("docs"), sum("chars").as("chars"),
          min("min_chars").as("min_chars"),
          max("max_chars").as("max_chars"))
        .withColumn("avg_chars",
          round(col("chars").cast("double") / col("docs"), 6))
    }),

    // Per-user rolling event features (the feature-engineering pass a
    // behavioral model trains on): event sequence number, microsecond
    // gap since the user's previous event, and a 5-event rolling mean
    // of `value`. ONE shuffle on user_id; every window is bounded
    // (rows frame), so state per key is O(5) regardless of history
    // length. Rolling sums are decimal-exact before the one double
    // division; (ts, event_id) total order makes ties deterministic.
    "q109_user_features" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val w5 = w.rowsBetween(-4, 0)
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("seq", row_number().over(w))
        .withColumn("gap_us", unix_micros(col("ts"))
          - lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("roll_avg_value",
          round(sum(col("value").cast("decimal(18,6)")).over(w5)
            .cast("double") / count(lit(1)).over(w5), 6))
        .select("user_id", "event_id", "seq", "gap_us", "roll_avg_value")
    }),

    // PageRank (5 fixed iterations, damping 0.85) over the
    // customer—supplier bipartite graph induced by orders⨝lineitem —
    // graph centrality as a product op, the weighted counterpart of
    // the dedup suite's connected components. Per iteration: one join
    // of the (cached) edge list against current ranks + one groupBy on
    // the destination — the standard distributed PR shape. Ranks are
    // localCheckpoint'ed EAGERLY each round (the dupLabels discipline):
    // without it every action replays the whole 5-round join chain —
    // 10x the cost here, unbounded lineage at scale. Cross-engine
    // determinism: ranks
    // are FIXED-POINT BIGINTs in 1e-10 units and every step is integer
    // arithmetic (integral division floors identically everywhere;
    // sums are exact) — float rounding differs between engines at the
    // 10th digit over thousands of contributions, so no float touches
    // the recurrence; the reported double is one final division of
    // identical integers. Every node has degree >= 1 by construction,
    // so no dangling-mass term. Top-20, deterministic tie-break.
    "q110_pagerank" -> ((s, d) => {
      // packed LONG node ids (customer = 2k, supplier = 2k+1): string
      // keys would double the broadcast and slow every hash probe;
      // names are decoded only on the 20 output rows
      val ol = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
        // checkpoint the pair table ONCE (the q157/q197/q203 idiom):
        // left lazy, the orders⋈lineitem⋈distinct subtree re-executes
        // for deg.count(), and again under BOTH sides of the
        // edges⋈deg join that seeds the round cache
        .localCheckpoint(true)
      val edges = ol.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(ol.select(col("b").as("src"), col("a").as("dst")))
      val ranks = pageRankFixedPoint(edges, rounds = 5)
      val name = concat(
        when(col("node") % 2 === 0, "c").otherwise("s"),
        expr("node div 2"))
      ranks.select(name.as("node"), col("r_fp"),
          (col("r_fp").cast("double") / 1e10).as("rank"))
        .orderBy(col("r_fp").desc, col("node").asc).limit(20)
    }),

    // Personalized PageRank (5 iterations, damping 0.85, restart on
    // the custkey % 100 == 0 seed customers) over the same bipartite
    // graph as q110 — the crawl-frontier-prioritization / related-
    // entity primitive: rank mass concentrates in the seeds'
    // neighborhoods instead of global centrality. Identical exact
    // fixed-point discipline; the seed share 1e10 div |S| and the
    // restart (15·share) div 100 floor identically in both engines.
    "q286_ppr" -> ((s, d) => {
      val ol = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
        .localCheckpoint(true) // one materialization (q110 comment)
      val edges = ol.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(ol.select(col("b").as("src"), col("a").as("dst")))
      val seeds = Tables.load(s, d, "orders")
        .filter(col("o_custkey") % 100 === 0)
        .select((col("o_custkey").cast("long") * 2).as("node"))
        .distinct()
      val ranks = pprFixedPoint(edges, seeds, rounds = 5)
      val name = concat(
        when(col("node") % 2 === 0, "c").otherwise("s"),
        expr("node div 2"))
      ranks.select(name.as("node"),
          (col("node") % 200 === 0).as("is_seed"), col("r_fp"),
          (col("r_fp").cast("double") / 1e10).as("rank"))
        .orderBy(col("r_fp").desc, col("node").asc).limit(20)
    }),

    // PURGED TIME SPLIT — the temporal train/test protocol
    // (de Prado's purged CV, the split rule that keeps time-series
    // evaluation honest): the last 7 days are TEST, the 2 days
    // before them are the EMBARGO (dropped — rows whose label
    // horizon would straddle the boundary), everything earlier is
    // TRAIN. One pass, day arithmetic on the calendar-bounded
    // domain; per-split censuses plus the train∩test user overlap
    // (expected and reported, NOT leakage — the leakage channel in
    // time series is temporal adjacency, which the embargo removes).
    "q301_purged_split" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val mx = broadcast(ev.agg(max("day").as("mx")))
      val tagged = ev.crossJoin(mx).select(col("day"), col("user_id"),
        when(col("day") >= date_sub(col("mx"), 6), "3_test")
          .when(col("day") >= date_sub(col("mx"), 8), "2_embargo")
          .otherwise("1_train").as("split"))
      val census = tagged.groupBy("split")
        .agg(count(lit(1)).as("rows"),
          countDistinct(col("day")).as("days"),
          min("day").as("min_day"), max("day").as("max_day"),
          countDistinct(col("user_id")).as("users"))
      val overlap = tagged.filter(col("split") === "1_train")
        .select("user_id").distinct()
        .join(tagged.filter(col("split") === "3_test")
          .select("user_id").distinct(), "user_id")
        .agg(count(lit(1)).as("rows"))
        .select(lit("4_user_overlap").as("split"), col("rows"),
          lit(0L).as("days"),
          lit("1970-01-01").cast("date").as("min_day"),
          lit("1970-01-01").cast("date").as("max_day"),
          col("rows").as("users"))
      census.unionByName(overlap).orderBy("split")
    }),

    // MULTI-TOUCH ATTRIBUTION — the credit-assignment twin of the
    // q87/q111 funnel: every purchase splits exactly 1e6 fixed-point
    // credit across the views that preceded it within 30 minutes
    // (linear attribution), integer division with the REMAINDER
    // pinned to the last touch — so credit conserves exactly
    // (Σ per purchase ≡ 1e6, no float leakage) and every engine
    // agrees to the unit. Shape: one interval join + one window
    // PARTITIONED BY PURCHASE (bounded by that purchase's touch
    // count, never global).
    "q298_multitouch" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, d, "events")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"),
          col("event_id").as("v_eid"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"),
          col("event_id").as("p_eid"))
      val w = Window.partitionBy("p_eid")
      val wOrd = w.orderBy(col("v_ts").desc, col("v_eid").desc)
      v.join(p, col("user_id") === col("p_uid")
          && col("v_ts") <= col("p_ts")
          && col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("touch_rank", row_number().over(wOrd))
        .select(col("user_id"), col("p_eid"), col("v_eid"), col("k"),
          when(col("touch_rank") === 1,
            lit(1000000L) - (col("k") - 1) * expr("1000000 div k"))
            .otherwise(expr("1000000 div k")).as("credit_fp"))
        .orderBy("p_eid", "v_eid")
    }),

    // PARQUET FOOTER-STATS AUDIT — the lakehouse pruning contract
    // made driver-visible: write the documents table as ONE parquet
    // row group, then read the FOOTER back through parquet-mr (the
    // metadata path a scan planner actually uses — no data pages
    // touched) and emit each numeric column's row count, null count
    // and min/max statistics. The oracle recomputes the same values
    // from the DATA — footer stats that don't match the data are
    // exactly the corruption that silently breaks min/max pruning
    // at 100 TB. Bounded driver work: one footer, two columns.
    "q297_footer_stats" -> ((s, d) => {
      import s.implicits._
      val dir = s"${scratch(d)}/footer_audit"
      val base = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      ScratchGuard.ensure(s, dir, base)(
        fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"))) {
        base.coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir)
      }
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          part, s.sparkContext.hadoopConfiguration))
      val rows = try {
        val blocks = reader.getFooter.getBlocks
        require(blocks.size == 1,
          s"expected one row group, got ${blocks.size}")
        val block = blocks.get(0)
        import scala.jdk.CollectionConverters._
        block.getColumns.asScala.toSeq.map { c =>
          val st = c.getStatistics
          (c.getPath.toDotString, blocks.size, block.getRowCount,
            st.getNumNulls,
            st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        }
      } finally reader.close()
      rows.toDF("column_name", "row_groups", "n_rows", "null_count",
          "stat_min", "stat_max")
        .orderBy("column_name")
    }),

    // SKEW-MITIGATED JOIN as a gated op: the fact side's synthetic
    // hot key absorbs ~70% of all orders (the celebrity-key shape
    // that melts one reducer at 100 TB); SkewOps.saltedInnerJoin
    // splits it across 8 salt buckets by replicating the SMALL dim
    // side 8×, then the agg is a plain keyed sum. Result-set
    // equality with the unsalted join is the oracle (and SkewSpec's
    // plan assertion pins the mechanism) — salting must never change
    // answers, only the shuffle distribution.
    "q292_salted_join" -> ((s, d) => {
      val facts = Tables.load(s, d, "orders").select(
        when(col("o_orderkey") % 10 < 7, 0L)
          .otherwise(col("o_orderkey") % 25).cast("long").as("k"),
        col("o_totalprice"))
      val dim = Tables.load(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("k"), col("n_name"))
      SkewOps.saltedInnerJoin(facts, dim, "k", buckets = 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
            .as("total_price"))
        .orderBy("n_name")
    }),

    // Source-format interop gate: the events table written once as
    // CSV (headers, quoting — props carries embedded JSON with commas
    // and quotes) and as JSON lines, re-read through explicit schemas,
    // and value-checked against the PARQUET original via the DuckDB
    // oracle: identity checksum (md5-derived, engine-independent),
    // exact-decimal value sum, and props byte count. Shortest-
    // round-trip double serialization makes the value column exact
    // across the rewrite. One narrow pass per format + a 2-row agg —
    // proves the non-parquet readers produce byte-identical rows, not
    // just equal counts.
    "q113_source_roundtrip" -> ((s, d) => {
      val base = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("props"))
      val root = s"${scratch(d)}/roundtrip"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      // guards on the _SUCCESS markers, not the directories: Spark
      // creates the dir when a write job STARTS, so a crash mid-write
      // leaves a partial dir that a dir-existence guard would serve
      // forever; _SUCCESS only appears on commit, and Overwrite mode
      // replaces the partial attempt. PLUS the ScratchGuard
      // signature: a regenerated events.parquet must force a
      // re-export, not serve last generation's csv/json.
      def committed(sub: String) = fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/$sub/_SUCCESS"))
      ScratchGuard.ensure(s, root, base)(
        committed("csv") && committed("json")) {
        base.write.mode(SaveMode.Overwrite)
          .option("header", "true").csv(s"$root/csv")
        base.write.mode(SaveMode.Overwrite).json(s"$root/json")
      }
      val schema = base.schema
      def summarize(df: org.apache.spark.sql.DataFrame, fmt: String) = {
        // nulls coalesced to an explicit sentinel BEFORE hashing, on
        // both sides: Spark's concat_ws silently skips null fields
        // while the oracle's || chain nulls the whole hash input —
        // without the sentinel a single null column diverges the gate
        val nn = (c: org.apache.spark.sql.Column) =>
          coalesce(c.cast("string"), lit("\u0001"))
        val fp = conv(substring(md5(concat_ws("|", nn(col("event_id")),
          nn(col("user_id")), nn(col("event_type")))), 1, 15), 16, 10)
          .cast("long") % 1000000007L
        df.agg(count(lit(1)).as("rows"),
          sum(fp).as("id_checksum"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("value_sum"),
          sum(coalesce(length(col("props")), lit(0)).cast("long"))
            .as("props_bytes"))
          .withColumn("fmt", lit(fmt))
      }
      summarize(s.read.schema(schema).option("header", "true")
          .csv(s"$root/csv"), "csv")
        .unionAll(summarize(s.read.schema(schema).json(s"$root/json"),
          "json"))
    }),

    // ORC interop — the THIRD lake format next to q113's CSV/JSON,
    // and the first columnar one: the events table (INCLUDING the
    // timestamp column CSV/JSON round-trip as strings) written once
    // as ORC through Spark's native writer, re-read with an explicit
    // schema, and value-checked against the parquet original via the
    // engine-independent md5 identity checksum, an epoch-micros
    // timestamp checksum, the exact-decimal value sum, and the props
    // byte count. Proves the ORC reader/writer preserve rows AND
    // instants byte-exactly — the gate a mixed parquet/ORC lake needs
    // before trusting cross-format unions.
    "q266_orc_roundtrip" -> ((s, d) => {
      val base = Tables.load(s, d, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      val root = s"${scratch(d)}/orc_roundtrip"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def committed = fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/orc/_SUCCESS"))
      ScratchGuard.ensure(s, root, base)(committed) {
        base.write.mode(SaveMode.Overwrite).orc(s"$root/orc")
      }
      val back = s.read.schema(base.schema).orc(s"$root/orc")
      val nn = (c: org.apache.spark.sql.Column) =>
        coalesce(c.cast("string"), lit("\u0001"))
      val fp = conv(substring(md5(concat_ws("|", nn(col("event_id")),
        nn(col("user_id")), nn(col("event_type")))), 1, 15), 16, 10)
        .cast("long") % 1000000007L
      back.agg(count(lit(1)).as("rows"),
        sum(fp).as("id_checksum"),
        sum(unix_micros(col("ts")) % 1000000007L).as("ts_checksum"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("value_sum"),
        sum(coalesce(length(col("props")), lit(0)).cast("long"))
          .as("props_bytes"))
        .withColumn("fmt", lit("orc"))
    }),

    // Ordered-event funnel (view -> click -> purchase, strictly
    // increasing event time): the conversion analysis every product
    // pipeline runs. Stage N's earliest qualifying time comes from a
    // groupBy(user) + a join against stage N-1's time — every exchange
    // is on user_id, so the stage join and the stage groupBy SHARE one
    // event-stream shuffle per stage whether or not the user-sized
    // stage table broadcasts; that makes the broadcast AQE's runtime
    // call (user tables GROW with the corpus — a mandatory hint is
    // the q126 scale-killer class). Exact timestamps make the
    // strict-order comparison cross-engine deterministic.
    "q111_funnel" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      v.agg(count(lit(1)).as("users_viewed"))
        .crossJoin(c.agg(count(lit(1)).as("users_clicked")))
        .crossJoin(p.agg(count(lit(1)).as("users_purchased")))
    }),

    // Retention cohorts: users grouped by first-seen day, activity
    // counted per day-offset since — the (cohort x offset) retention
    // matrix. The first-seen table is USER-sized — it GROWS, so the
    // join back is a plain equi-join on user_id (co-partitioned with
    // the groupBy that built it; AQE broadcasts when it measures
    // small) before the final distinct-count on the low-cardinality
    // (cohort, offset) key.
    "q112_retention" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("ts"))
      val first = ev.groupBy("user_id")
        .agg(to_date(min(col("ts"))).as("cohort_d"))
      ev.join(first, "user_id")
        .groupBy(col("cohort_d").cast("string").as("cohort"),
          datediff(to_date(col("ts")), col("cohort_d")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("users"))
    }),

    // Event-time interval join (view -> purchase attribution within
    // 30min): the batch twin of StreamOps.viewPurchaseJoin — the
    // stream-stream join's semantics, value-checked by DuckDB here and
    // stream==batch in StreamingSpec.
    "q87_stream_interval_join" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
      v.join(p, col("user_id") === col("p_uid")
          && col("p_ts") >= col("v_ts")
          && col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("pairs"),
          countDistinct(col("p_ts")).as("purchases_attributed"))
    }),

    // Triangle count + global clustering coefficient on the
    // co-purchase graph (parts sharing an order) — the canonical
    // "graph metric that dies on hubs if you join naively" operator.
    // Edge build: per-order self-join (fan-out bounded by max basket
    // size squared, one exchange on the order key), distinct. The
    // count uses DEGREE ORIENTATION: each undirected edge is directed
    // from its (degree, id)-smaller endpoint, which bounds every
    // wedge-join fan-out by the max oriented out-degree — O(sqrt(|E|))
    // even on power-law graphs — instead of the raw hub degree an
    // id-ordered a<b<c join suffers. The closing edge then resolves
    // with one equi-join: for a triangle with vertices a<b<c in the
    // (deg,id) total order, the wedge is (a; b,c) and the closer is
    // exactly the stored directed edge b->c. The DuckDB oracle counts
    // the same triangles the simple way — identical totals prove the
    // orientation exact. Exchanges: order-key join, degree agg, two
    // hash joins on vertex keys; all AQE-re-balanceable.
    "q125_triangle_count" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = li.toDF("o", "u").join(li.toDF("o", "v"), "o")
        .filter(col("u") < col("v")).select("u", "v").distinct()
      val (nNodes, nEdges, nTri, wedgeTot) = triangleStats(edges)
      Seq((nNodes, nEdges, nTri)).toDF("n_nodes", "n_edges", "n_triangles")
        .withColumn("gcc",
          round(lit(3.0) * col("n_triangles") / lit(wedgeTot), 6))
    }),

    // First-order Markov transition matrix over per-user event
    // sequences — the behavioral-model fit every event pipeline runs.
    // ONE exchange on user_id feeds the lead() window (event_id breaks
    // ts ties deterministically); the transition table is
    // |event_types|² — tiny — so the probability normalization join
    // is a broadcast no-op at any corpus size.
    "q128_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val pairs = Tables.load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("a"))
        .withColumn("b", lead(col("a"), 1).over(w))
        .filter(col("b").isNotNull)
      val c = pairs.groupBy("a", "b").agg(count(lit(1)).as("n"))
      val tot = c.groupBy("a").agg(sum("n").as("na"))
      c.join(broadcast(tot), "a")
        .select(col("a"), col("b"), col("n"),
          round(col("n").cast("double") / col("na"), 6).as("p"))
    }),

    // Z-ORDER layout tiles — multi-dimensional data clustering, the
    // lakehouse trick that makes min/max data skipping work on TWO
    // keys at once. zval interleaves the bits of (x, y) with pure
    // integer mask/shift arithmetic (codegen'd, and bit-identical in
    // any engine); tile = high byte of zval = a 256x256 square of key
    // space. The per-tile min/max stats this query emits are exactly
    // the footer stats a writer clustered by zval would give every
    // parquet file — ScaleOpsSpec drives a box query against them and
    // asserts it prunes nearly every tile while losing no rows.
    "q129_zorder_tiles" -> ((s, d) => {
      val z = zval(pmod(col("l_partkey"), lit(4096L)),
        pmod(col("l_orderkey"), lit(4096L)))
      Tables.load(s, d, "lineitem")
        .select(pmod(col("l_partkey"), lit(4096L)).as("x"),
          pmod(col("l_orderkey"), lit(4096L)).as("y"),
          shiftright(z, 16).as("tile"))
        .groupBy("tile")
        .agg(count(lit(1)).as("n"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
    }),

    // Market-basket pair mining (frequent co-purchased part pairs with
    // lift) — association mining, the recommendation/affinity shape.
    // Pair generation is NARROW after one basket shuffle: baskets are
    // bounded (an order holds at most a handful of distinct parts), so
    // the quadratic expansion happens inside a sorted array per order
    // — never a lineitem self-join whose fan-out an optimizer can't
    // bound. Part supports are |parts| rows and the order total is a
    // scalar: both ride broadcast. Lift's arithmetic is
    // integer-exact until one final double divide, so the oracle
    // checks VALUES.
    "q134_basket_pairs" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
        .cache() // read 3x: baskets, per-part support, order total
      val baskets = li.groupBy("o")
        .agg(sort_array(collect_set(col("p"))).as("ps"))
        .filter(size(col("ps")) >= 2)
      val pairs = baskets.select(explode(flatten(transform(
          sequence(lit(1), size(col("ps")) - 1),
          i => transform(
            slice(col("ps"), i + 1, size(col("ps")) - i),
            b => struct(element_at(col("ps"), i).as("a"), b.as("b"))))))
          .as("pr"))
        .select(col("pr.a").as("a"), col("pr.b").as("b"))
      val pc = li.groupBy("p").agg(count(lit(1)).as("np"))
      val no = li.agg(countDistinct(col("o")).as("n_orders"))
      val c = pairs.groupBy("a", "b").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
      c.join(broadcast(pc.select(col("p").as("a"), col("np").as("na"))), "a")
        .join(broadcast(pc.select(col("p").as("b"), col("np").as("nb"))), "b")
        .crossJoin(broadcast(no))
        .select(col("a"), col("b"), col("n"),
          round(col("n").cast("double") * col("n_orders")
            / (col("na") * col("nb")), 6).as("lift"))
    }),

    // SKYLINE (Pareto frontier: min price, max size) — the
    // multi-criteria "best tradeoffs" operator, distributed the
    // classic two-phase way: a LOCAL skyline sweep per partition
    // (narrow mapPartitions, sort + one pass), then the GLOBAL
    // skyline of the tiny candidate union (the global frontier is
    // always a subset of the union of local frontiers, for any
    // partitioning). No n² dominance join, no global sort of the
    // input; the only window runs over the per-price groups of the
    // candidate set — frontier-sized, not data-sized. The DuckDB
    // oracle recomputes dominance the independent NOT EXISTS way.
    "q135_skyline" -> ((s, d) =>
      skyline(Tables.load(s, d, "part")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size")))),

    // Batch sessionization (8h inactivity gap) — the batch twin of the
    // q122 streaming sessionize gate, and the canonical
    // lag-flag-then-running-sum shape: session boundaries from one lag,
    // session ids from one running count, then two aggregations. ALL
    // of it rides a SINGLE user_id exchange — the windows share one
    // (user_id) sort, and both downstream groupBys
    // ((user_id, sess_id), then (user_id)) are satisfied by the
    // existing hash partitioning (ClusteredDistribution subsets), so
    // Catalyst inserts no further shuffle. State per key is O(1);
    // (us, event_id) total order makes boundary ties deterministic.
    "q150_sessionize_batch" -> ((s, d) =>
      sessions(s, d).groupBy("user_id").agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"),
        sum(col("b_us") - col("a_us")).as("total_session_us"),
        round(sum("n_events").cast("double") / count(lit(1)), 6)
          .as("avg_session_events"))),

    // Semi-structured extraction: parse the JSON `props` payload with
    // Spark's codegen'd JSON path evaluation (get_json_object — no
    // UDF, no mapPartitions JSON library loop) and aggregate the
    // extracted field per event type. One scan, one partial+final agg
    // exchange; the parse happens map-side inside whole-stage codegen,
    // which is the only shape that survives a 100TB event log — any
    // per-row driver or Python hop here multiplies the scan cost.
    "q152_json_extract" -> ((s, d) =>
      Tables.load(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type").agg(
          count(lit(1)).as("n"),
          count(col("k")).as("n_k"),
          sum("k").as("sum_k"),
          min("k").as("min_k"),
          max("k").as("max_k"),
          countDistinct(col("k")).as("distinct_k"),
          round(sum("k").cast("double") / count(col("k")), 6)
            .as("avg_k"))),

    // SCD type-2 dimension build — the lakehouse history table that
    // q140's CDC merge feeds: collapse each user's event stream into
    // state VERSIONS (consecutive duplicate states merged), each with
    // [valid_from, valid_to) microsecond interval and a current flag.
    // Both windows (the lag that detects changes, the lead that closes
    // intervals over the SURVIVING rows) share one user_id exchange —
    // the filter preserves partitioning, so Catalyst reuses the sort.
    // Epoch-us output keeps the oracle compare timezone-proof.
    "q153_scd2_history" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type").as("state"))
        .withColumn("prev", lag(col("state"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("state"))
        .withColumn("valid_to_us", lead(col("us"), 1).over(w))
        .withColumn("is_current", col("valid_to_us").isNull)
        .select(col("user_id"), col("state"),
          col("us").as("valid_from_us"), col("valid_to_us"),
          col("is_current"))
    }),

    // Peak concurrency (max simultaneous sessions) — the classic
    // sweep-line: ±1 deltas at session starts/ends, a GLOBAL running
    // sum over time order, take the max. The global prefix is exactly
    // what naive SQL does with an unpartitioned window (single task
    // holding every delta); here it is the shared range-partitioned
    // two-phase scan ([[DistributedPrefix.scan]] — q77/q135/q136's
    // idiom), so the sweep parallelizes and the driver sees
    // O(partitions) partials. Tie rule: +1 sorts before −1 at the same
    // instant (touching sessions count as concurrent), pinned
    // identically in the oracle's ORDER BY t, dlt DESC.
    "q154_peak_concurrency" -> ((s, d) => peakConcurrency(sessions(s, d))),

    // Label-propagation community detection (synchronous, 3 rounds,
    // deterministic): every node starts as its own community; each
    // round adopts the most frequent label among its neighbors with
    // ties broken by SMALLEST label — fully deterministic, so the
    // oracle replays the identical recurrence as an unrolled CTE
    // chain. Complements q110 (centrality) and the dedup suite's
    // HashMin connected components (q65 — which converges to reachable
    // sets; LPA finds densely-linked clusters INSIDE one component).
    // Scale shape per round: the node-sized label table broadcasts
    // into the edge join (edges never shuffle for it), the
    // (dst, label) count is partial+final, and the per-node argmax is
    // one window over node-sized data; labels localCheckpoint per
    // round — bounded lineage at any round count.
    "q157_lpa_communities" -> ((s, d) => {
      val eo = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
      val edges = eo.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(eo.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(true)
      var labels = edges.select(col("src").as("v")).distinct()
        .select(col("v"), col("v").as("lbl"))
      // runtime shape switch (the pageRankFixedPoint idiom): one
      // bounded scalar job decides whether the node-sized label table
      // is broadcast-comfortable or the rounds must shuffle-join —
      // a mandatory broadcast of a table that grows with the graph
      // is the q126 scale-killer class
      val bcastLbl = labels.count() <= broadcastRowLimit(16)
      for (_ <- 1 to 3)
        labels = lpaRound(edges, labels, broadcastLabels = bcastLbl)
          .localCheckpoint(true)
      labels.groupBy("lbl").agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("lbl").asc).limit(20)
        .select(col("lbl").as("community"), col("n_members"))
    }),

    // l-diversity audit — the companion gate q148's k-anonymity
    // misses: a class can be large (k-safe) yet expose its SENSITIVE
    // attribute because every member shares one value. Classes =
    // (nation, balance band); sensitive = market segment; report
    // minimum distinct-sensitive count, below-l classes and their row
    // mass. Same single-scan two-level aggregate shape as q148 (the
    // distinct is bounded by the sensitive domain).
    "q158_l_diversity" -> ((s, d) =>
      Tables.load(s, d, "customer")
        .select(col("c_nationkey").as("nat"),
          (floor(col("c_acctbal") / 1000.0) * 1000).cast("long")
            .as("bal_band"),
          col("c_mktsegment").as("seg"))
        .groupBy("nat", "bal_band")
        .agg(count(lit(1)).as("k"), countDistinct(col("seg")).as("l"))
        .agg(min(col("l")).as("l_min"),
          count(lit(1)).as("n_classes"),
          sum(when(col("l") < 3, 1L).otherwise(0L)).as("classes_lt3"),
          sum(when(col("l") < 3, col("k")).otherwise(0L))
            .as("rows_at_risk"))),

    // T-CLOSENESS — the third rung of the privacy ladder (q148
    // k-anonymity: classes big enough; q158 l-diversity: sensitive
    // values varied enough; t-closeness: the class's sensitive
    // DISTRIBUTION close enough to the global one that membership
    // leaks nothing). For categorical sensitives the earth-mover
    // distance is total variation: t_c = ½ Σ_s |Q_c(s) − P(s)| =
    // tnum_c / (2·k_c·N) with tnum_c = Σ_s |cnt_cs·N − k_c·g_s| — an
    // EXACT integer per class (zero cells included via the class ×
    // sensitive grid), one double division each, and the ≥ 0.3
    // threshold compared in pure integers (10·tnum > 6·k·N). Grid =
    // classes × sensitive domain, broadcast on the 5-row sensitive
    // side — never corpus-sized.
    "q195_t_closeness" -> ((s, d) => {
      val n = Tables.load(s, d, "customer").count()
      tClosenessPerClass(Tables.load(s, d, "customer")
        .select(col("c_nationkey").as("nat"),
          (floor(col("c_acctbal") / 1000.0) * 1000).cast("long")
            .as("bal_band"),
          col("c_mktsegment").as("seg")))
        .agg(
          count(lit(1)).as("n_classes"),
          sum("k").as("n_rows"),
          max("t").as("t_max"),
          sum(when(col("tnum") * 10 > lit(6L) * col("k") * n, 1L)
            .otherwise(0L)).as("classes_gt03"),
          sum(when(col("tnum") * 10 > lit(6L) * col("k") * n, col("k"))
            .otherwise(0L)).as("rows_at_risk"))
    }),

    // K-CORE decomposition — the degeneracy rung of the graph family
    // (q110 rank, q125 triangles, q157 communities): iteratively peel
    // nodes of degree < k until fixpoint; what survives is the
    // k-core. Degrees are maintained INCREMENTALLY (a (v, deg) table,
    // decremented by the peeled frontier's incident edges) — each
    // edge shuffles at most once across all rounds, so total work is
    // O(E + rounds·|alive|) and the round count is the graph's peel
    // DEPTH, not its size. Per k ∈ {8, 20, 40} on the bipartite customer–supplier
    // graph: core size, undirected core edges, an id-sum membership
    // checksum (same-count-wrong-set cannot pass), and rounds to
    // fixpoint (survivors only shrink, so count equality IS set
    // equality). The oracle unrolls 8 peel rounds per k as generated
    // CTE chains; these graphs fix in ≤ 3, and the spec pins a
    // one-node-per-round chain cascade where the depth is 4.
    "q197_kcore" -> ((s, d) => {
      val eo = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
      val edges = eo.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(eo.select(col("b").as("src"), col("a").as("dst")))
        .localCheckpoint(true)
      // the three peels are INDEPENDENT job chains over the same
      // checkpointed edges — run them from a driver pool (guide §2.6)
      // so each peel's small-stage tail backfills the others' cores
      graft.Util.inParallel(s,
          Seq(8, 20, 40).map(k => () => kCore(edges, k)))
        .reduce(_ unionByName _)
        .orderBy("k")
    }),

    // LINK PREDICTION by wedge enumeration — the graph twin of q134's
    // basket lift: score NON-adjacent part pairs by their common
    // neighbors in the session-adjacency graph (parts consecutive by
    // line number within an order — the item2item graph recommenders
    // build from browse sequences). Score = the Resource-Allocation
    // index Σ_w 1/deg(w) over shared neighbors w (Zhou-Lü-Zhang 2009;
    // Adamic-Adar is the same shape with 1/ln deg) — per-wedge terms
    // are one IEEE division rounded to 9 dp and DECIMAL-summed, so
    // both engines agree exactly. Wedges enumerate via the CENTER
    // node (one self-join shuffle on src); cost is Σ C(deg,2) — on a
    // session graph degree is bounded by co-occurrence fan-out, not
    // corpus size (and the standard hub cap applies before the join
    // at 100 TB). Candidates anti-join the edge set (predict only
    // MISSING links); node-sized degree table broadcasts; TakeOrdered
    // top-20 under the total (ra desc, u, v) order.
    "q198_link_predict" -> ((s, d) => {
      val sq = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_linenumber").as("ln"),
          col("l_partkey").as("p"))
      val und = sq.as("a").join(sq.as("b"),
          col("a.o") === col("b.o") &&
            col("b.ln") === col("a.ln") + 1 &&
            col("a.p") =!= col("b.p"))
        .select(least(col("a.p"), col("b.p")).as("u"),
          greatest(col("a.p"), col("b.p")).as("v"))
        .distinct().localCheckpoint(true)
      linkPredict(und)
        .orderBy(col("ra").desc, col("u").asc, col("v").asc)
        .limit(20)
    }),

    // HITS hubs & authorities — the query-dependent ranking twin of
    // q110's PageRank, on the bipartite customer→supplier graph
    // (customers are hubs, suppliers authorities). UNNORMALIZED for
    // three rounds, so every score is an exact BIGINT count of
    // alternating paths (a_r = Iᵀh_{r-1}, h_r = I·a_r — Kleinberg's
    // recurrence with the normalization deferred, which changes no
    // ranking): zero float exposure in either engine. Each half-round
    // is one edge-shuffle aggregate with a broadcast node-sized score
    // table; 3 rounds ⇒ scores ≤ deg⁶·n ≈ 1e12 here — far inside
    // BIGINT at any tested sf. Top-10 per role under the total
    // (score desc, id) order.
    "q200_hits" -> ((s, d) => {
      val e = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          col("l_suppkey").cast("long").as("sp"))
        .distinct().localCheckpoint(true)
      // score tables are bounded by the edge count; one cheap count
      // of the checkpointed table picks broadcast vs shuffle rounds
      val (a, h) = hitsScores(e, rounds = 3,
        broadcastScores = e.count() <= broadcastRowLimit(24))
      val topA = a.select(lit("auth").as("role"), col("sp").as("id"),
        col("score")).orderBy(col("score").desc, col("id").asc).limit(10)
      val topH = h.select(lit("hub").as("role"), col("c").as("id"),
        col("score")).orderBy(col("score").desc, col("id").asc).limit(10)
      topA.unionByName(topH)
    }),

    // MULTI-SOURCE WEIGHTED SHORTEST PATHS (Bellman-Ford relaxation)
    // — the "distance to nearest depot" shape: every 100th customer
    // is a seed, edge weight = the minimum shared-order quantity on
    // the customer–supplier edge, and six relaxation rounds (the
    // graph's hop diameter is ~4) converge to exact integer
    // distances. Each round joins edges against ONLY the delta
    // frontier (rows improved last round) and min-merges into the
    // settled table ([[ssspRounds]]) — the standard distributed SSSP
    // shape, edge-shuffle volume bounded by the live frontier, so the
    // post-convergence rounds (hop diameter ~4 < 6) join an empty
    // frontier and cost ~nothing. min-relaxation is
    // order-independent, so both engines agree exactly; the output
    // carries a CONVERGED flag (round 6 changed nothing vs round 5)
    // so an undersized round budget is a visible false, not a silent
    // wrong answer.
    "q203_sssp" -> ((s, d) => {
      val wEdges = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .agg(min(col("l_quantity").cast("long")).as("w"))
      // hash-partitioned by src BEFORE the checkpoint: every round's
      // edge⋈frontier join then reuses this layout (LogicalRDD keeps
      // the partitioning) instead of re-shuffling the full edge table
      // per round — at 100x scale that is THE dominant cost
      val edges = wEdges.select(col("a").as("src"), col("b").as("dst"),
          col("w"))
        .unionByName(wEdges.select(col("b").as("src"),
          col("a").as("dst"), col("w")))
        .repartition(col("src"))
        .localCheckpoint(true)
      val nodes = edges.select(col("src").as("v")).distinct()
        .localCheckpoint(true)
      val seeds = nodes.filter(col("v") % 200 === 0) // custkey % 100 == 0
        .select(col("v"), lit(0L).as("dist"))
      val (d5, d6) = ssspRounds(edges, seeds, rounds = 6)
      val changed = d6.join(d5.withColumnRenamed("dist", "prev"),
          Seq("v"), "left")
        .filter(col("prev").isNull || col("dist") < col("prev")).count()
      val nNodes = nodes.count()
      d6.agg(count(lit(1)).as("n_reached"),
          sum("dist").as("sum_dist"), max("dist").as("max_dist"))
        .withColumn("n_unreached", lit(nNodes) - col("n_reached"))
        .withColumn("converged", lit(changed == 0L))
    }),

    // LANDMARK (multi-source) BFS — the distance-oracle embedding
    // (the Das Sarma et al. sketch shape): unweighted BFS from 4
    // landmark nodes runs as ONE fixpoint loop keyed on (node, seed),
    // so K landmarks cost K× state, not K× passes over the edges.
    // Published per landmark: reach, distance mass, eccentricity-
    // within-horizon, and the size of its nearest-landmark cell
    // (min (dist, seed) per node — the landmark-clustering
    // assignment). Same bipartite order graph, horizon 6 like q203,
    // convergence = no distance improved on the last round.
    "q257_landmark_bfs" -> ((s, d) => {
      val we = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("a"),
          (col("l_suppkey").cast("long") * 2 + 1).as("b"))
        .distinct()
      // src-partitioned for per-round join reuse (q203 idiom)
      val edges = we.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(we.select(col("b").as("src"), col("a").as("dst")))
        .repartition(col("src"))
        .localCheckpoint(true)
      val nodes = edges.select(col("src").as("v")).distinct()
        .localCheckpoint(true)
      val seeds = nodes.filter(col("v") % 2 === 0)
        .orderBy("v").limit(4)
        .select(col("v"), col("v").as("seed"), lit(0L).as("dist"))
      val (d5, d6) = landmarkBfsRounds(edges, seeds, rounds = 6)
      val changed = d6.join(d5.withColumnRenamed("dist", "prev"),
          Seq("v", "seed"), "left")
        .filter(col("prev").isNull || col("dist") < col("prev")).count()
      // nearest-landmark cell: min (dist, seed) per node, packed as
      // one integer so both engines break ties identically
      val cells = d6.groupBy("v")
        .agg(min(col("dist") * 1000000L + col("seed")).as("key"))
        .groupBy((col("key") % 1000000L).as("seed"))
        .agg(count(lit(1)).as("n_assigned"))
      d6.groupBy("seed")
        .agg(count(lit(1)).as("n_reached"), sum("dist").as("sum_dist"),
          max("dist").as("ecc6"))
        .join(cells, Seq("seed"), "left")
        .select(col("seed"), col("n_reached"), col("sum_dist"),
          col("ecc6"), coalesce(col("n_assigned"), lit(0L))
            .as("n_assigned"))
        .withColumn("converged", lit(changed == 0L))
        .orderBy("seed")
    }),

    // PERMUTATION TEST — the significance gate for pipeline A/B
    // audits ("is src0's doc length different from src1's beyond
    // chance?"), with every arbitrary choice made deterministic and
    // engine-identical: the P = 100 permutations come from the parity
    // of md5(doc_id:p) (reproducible across engines and reruns, the
    // q105/q115 idiom), and the extremeness comparison
    // |mean₀−mean₁| ≥ |mean_a−mean_b| is evaluated by exact integer
    // cross-multiplication |S₀n₁−S₁n₀|·(n_a n_b) ≥ |S_a n_b−S_b n_a|·
    // (n₀n₁) — no float ever decides a count. The permutation
    // dimension is a narrow explode bounded by P; partial aggregation
    // collapses it to 2P rows per partition before the one shuffle.
    "q205_perm_test" -> ((s, d) =>
      permTest(Tables.load(s, d, "documents")
        .filter(col("source").isin("src0", "src1"))
        .select(col("doc_id"), col("source"), col("n_chars").as("x")),
        "src0", "src1")),

    // POISSON BOOTSTRAP confidence interval — the DISTRIBUTED
    // bootstrap (Chamandy et al., "Estimating Uncertainty for
    // Massive Data Streams"): classic with-replacement resampling
    // needs global coordination, but Binomial(n, 1/n) → Poisson(1)
    // per row, so each replicate assigns every doc an independent
    // Poisson(1) weight and the resample never materializes. Here
    // the Poisson draw is DETERMINISTIC: u = md5(doc_id:r)-uniform
    // inverted through the λ=1 CDF thresholds (fixed 10-dp literals,
    // identical in both engines). Replicate sums stay integer
    // (W = Σw, S = Σw·x); means round to 6 dp only for the final
    // nearest-rank 2.5%/97.5% selection under the total (mean, r)
    // order. Same narrow P-bounded explode shape as q205.
    "q206_bootstrap_ci" -> ((s, d) =>
      bootstrapCi(Tables.load(s, d, "documents")
        .select(col("doc_id"), col("n_chars").as("x")))),

    // FUNCTIONAL-DEPENDENCY audit — the data-profiling pass
    // (Metanome-style) that validates assumed keys and discovers
    // denormalization errors before a pipeline trusts them. Five
    // candidate FDs across three tables, each ONE partial+final
    // aggregate over its LHS (the distinct-RHS count is bounded by
    // the RHS domain): reports distinct LHS groups, violating groups
    // (>1 distinct RHS), the row mass inside violating groups, and a
    // holds flag. Two candidates are true keys (must hold), three are
    // plausible-but-false dependencies (must report exact violation
    // mass) — a profiler that only samples would miss the near-keys.
    "q204_fd_audit" -> ((s, d) => {
      val cust = Tables.load(s, d, "customer")
      val ord = Tables.load(s, d, "orders")
      val li = Tables.load(s, d, "lineitem")
      Seq(
        fdAudit(ord, "o_orderkey->o_custkey",
          Seq("o_orderkey"), "o_custkey"),
        fdAudit(li, "l_orderkey,l_linenumber->l_partkey",
          Seq("l_orderkey", "l_linenumber"), "l_partkey"),
        fdAudit(cust, "c_nationkey->c_mktsegment",
          Seq("c_nationkey"), "c_mktsegment"),
        fdAudit(ord, "o_custkey->o_orderstatus",
          Seq("o_custkey"), "o_orderstatus"),
        fdAudit(li, "l_orderkey->l_suppkey",
          Seq("l_orderkey"), "l_suppkey")
      ).reduce(_ unionByName _)
    }),

    // BUTTERFLY counting — the bipartite analogue of q125's triangles
    // (a butterfly = a 2×2 biclique = two orders sharing two parts),
    // the motif that measures co-purchase redundancy where triangles
    // can't exist (bipartite graphs have none). Wedges enumerate
    // through the ORDER side, whose degree is basket-bounded (a
    // handful of parts per order), so wedge volume is Σ C(deg_o, 2) ≈
    // 6·|orders| — linear in the corpus, never |parts|². One shuffle
    // to the (p1, p2) co-degree table, then butterflies = Σ C(m, 2)
    // per pair — pure BIGINT end to end.
    "q201_butterflies" -> ((s, d) =>
      butterflyStats(Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct())),

    // Item-item collaborative-filtering similarity (the recommender
    // counterpart of q134's lift pairs): each event type is a vector
    // of per-user interaction counts; report cosine between every
    // type pair. The user-keyed self-join is the classic shape; the
    // per-item norm table is |items| rows and broadcasts back. All
    // dot products are exact integer sums — the only floats are the
    // two correctly-rounded sqrts and one multiply/divide, identical
    // in both engines. Per-user fan-out is bounded by |items|² (here
    // 25), and at corpus scale the standard frequent-user cap applies
    // before the join.
    "q159_item_cosine" -> ((s, d) => {
      val uc = Tables.load(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val norms = uc.groupBy("event_type")
        .agg(sum(col("c") * col("c")).as("n2"))
      val pairs = uc.as("x").join(uc.as("y"), "user_id")
        .filter(col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("ia"),
          col("y.event_type").as("ib"))
        .agg(sum(col("x.c") * col("y.c")).as("dot"))
      pairs
        .join(broadcast(norms.select(col("event_type").as("ia"),
          col("n2").as("na2"))), "ia")
        .join(broadcast(norms.select(col("event_type").as("ib"),
          col("n2").as("nb2"))), "ib")
        .select(col("ia"), col("ib"), col("dot"),
          round(col("dot").cast("double")
            / (sqrt(col("na2").cast("double"))
              * sqrt(col("nb2").cast("double"))), 6).as("cosine"))
        .orderBy(col("ia").asc, col("ib").asc)
    }),

    // Incremental view maintenance for a JOIN view (the delta-join
    // identity ΔJ = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB): the expensive base join is
    // materialized ONCE to guarded scratch; serving a "late batch" of
    // rows on BOTH sides then costs only the three delta terms — and
    // every delta term joins against a BROADCAST delta side, so the
    // big tables never re-shuffle for maintenance. The gate row pins
    // incremental == full-recompute row-for-row in-engine, plus
    // DuckDB-recomputable counts and a DECIMAL quantity total. This is
    // the mechanism behind every "don't rebuild the join, apply the
    // delta" pipeline at 100TB; q108 is its aggregation counterpart.
    "q165_ivm_join" -> ((s, d) => {
      import s.implicits._
      val root = s"${scratch(d)}/ivm_join"
      val ord = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val aOrd = ord.filter(col("o_orderkey") % 10 =!= 0)
      val dOrd = ord.filter(col("o_orderkey") % 10 === 0)
      val bLi = li.filter(col("l_orderkey") % 7 =!= 3)
      val dLi = li.filter(col("l_orderkey") % 7 === 3)
      def joined(o: DataFrame, l: DataFrame): DataFrame =
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"),
            col("l_linenumber"), col("l_quantity"))
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      // guard signature covers BOTH inputs (scan-only, no join)
      val sigDf = ord.select(xxhash64(col("o_orderkey"),
          col("o_custkey")).as("h"))
        .unionByName(li.select(xxhash64(col("l_orderkey"),
          col("l_linenumber"), col("l_quantity")).as("h")))
      ScratchGuard.ensure(s, root, sigDf)(
        fs.exists(new org.apache.hadoop.fs.Path(s"$root/base/_SUCCESS"))) {
        joined(aOrd, bLi).write.mode(SaveMode.Overwrite)
          .parquet(s"$root/base")
      }
      val base = s.read.parquet(s"$root/base")
      val delta = joined(broadcast(dOrd), bLi)
        .unionByName(joined(aOrd, broadcast(dLi)))
        .unionByName(joined(broadcast(dOrd), broadcast(dLi)))
      val inc = base.unionByName(delta)
      // row-level equivalence gate SAMPLE-BOUNDED (the q47/q133
      // discipline): the full-recompute comparison would defeat IVM's
      // purpose at scale, so exceptAll runs on a deterministic ~1%
      // key slice — while the count + DECIMAL quantity total below
      // (oracle-checked against the full recompute) cover EVERY row
      val keySample = col("o_orderkey") % 97 === 0
      val full = joined(ord, li)
      val eq = inc.filter(keySample).exceptAll(full.filter(keySample))
        .isEmpty &&
        full.filter(keySample).exceptAll(inc.filter(keySample)).isEmpty
      val r = inc.agg(count(lit(1)).as("n_total"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("qty")).head()
      val nBase = base.count()
      Seq((nBase, r.getLong(0) - nBase, r.getLong(0),
        r.getDecimal(1).doubleValue, eq))
        .toDF("n_base", "n_delta", "n_total", "qty_total",
          "inc_eq_full")
    }),

    // Percentile outlier trimming (the value-cleaning pass before any
    // regression/feature step): EXACT rank-based p1/p99 per event
    // type — row_number over one type-keyed sort, the rank-k values
    // picked inside the same aggregation, bounds joined back BROADCAST
    // (|types| rows) so the corpus is filtered map-side. Rank-based
    // (not approx/interpolated) so both engines select the identical
    // boundary VALUE; the trimmed mean rides DECIMAL. At 100TB the
    // per-type sort is the cost — swap in the q82 quantile sketch for
    // the bounds and keep this exact path as the correctness pin.
    "q163_outlier_trim" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), col("value"))
      val w = Window.partitionBy("event_type").orderBy(col("value").asc)
      val wn = Window.partitionBy("event_type")
      val bounds = ev
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy("event_type").agg(
          max(when(col("rn") === greatest(lit(1L),
            ceil(col("n") * 0.01)), col("value"))).as("p_lo"),
          max(when(col("rn") === ceil(col("n") * 0.99), col("value")))
            .as("p_hi"))
      ev.join(broadcast(bounds), "event_type")
        .groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(when(col("value") < col("p_lo"), 1L).otherwise(0L))
            .as("n_out_low"),
          sum(when(col("value") > col("p_hi"), 1L).otherwise(0L))
            .as("n_out_high"),
          round(sum(when(col("value").between(col("p_lo"), col("p_hi")),
            col("value").cast("decimal(18,6)"))).cast("double")
            / sum(when(col("value").between(col("p_lo"), col("p_hi")), 1L)
              .otherwise(0L)), 6).as("trimmed_mean"),
          round(max(col("p_lo")), 6).as("p_lo"),
          round(max(col("p_hi")), 6).as("p_hi"))
    }),

    // Per-user daily gap-fill (the time-series densification every
    // activity model needs: missing days are REAL zeros, not absent
    // rows): per-user day span exploded via sequence(), left join of
    // the dense calendar against the sparse daily counts, zero-fill,
    // then the islands trick (day minus row-number over zero days) for
    // the longest silent streak. Two user-keyed exchanges total; the
    // dense calendar is bounded by span×users, never corpus-sized.
    "q164_gap_fill" -> ((s, d) => {
      // persist: daily is referenced by three branches (span, fill
      // join, islands) — without it each branch re-scans the raw
      // events; the cached form is users×days, corpus-independent
      val daily = Tables.load(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("n"))
        .persist()
      val span = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val filled = span
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
            .as("day"))
        .join(daily, Seq("user_id", "day"), "left")
        .na.fill(0L, Seq("n"))
      val zw = Window.partitionBy("user_id").orderBy(col("day").asc)
      val longestZero = filled.filter(col("n") === 0)
        .withColumn("grp", date_sub(col("day"), row_number().over(zw)))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("run"))
        .groupBy("user_id").agg(max("run").as("longest_zero_run"))
      filled.groupBy("user_id").agg(
        count(lit(1)).as("span_days"),
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("active_days"),
        sum(when(col("n") === 0, 1L).otherwise(0L)).as("zero_days"),
        sum("n").as("total_events"))
        .join(longestZero, Seq("user_id"), "left")
        .na.fill(0L, Seq("longest_zero_run"))
    }),

    // NEGATIVE edge sampling for link prediction — the contrastive
    // counterpart of q145's hard negatives on the GRAPH side: training
    // a link predictor needs (cust, supp) pairs that are NOT edges,
    // sampled deterministically (md5-driven proposals) and verified
    // against the real edge set with an ANTI-join (the proposal table
    // is tiny; the edge set never broadcasts). The gate re-checks the
    // selected sample against the edges through an independent inner
    // join — zero hits — and carries an order-invariant checksum so
    // the oracle pins the exact sample, not just its size.
    "q181_negative_edges" -> ((s, d) => {
      import s.implicits._
      val edges = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("ec"),
          col("l_suppkey").cast("long").as("es"))
        .distinct()
      val nc = Tables.load(s, d, "customer")
        .agg(max("c_custkey")).head().getLong(0)
      val ns = Tables.load(s, d, "supplier")
        .agg(max("s_suppkey")).head().getLong(0)
      def h(prefix: String): Column =
        conv(substring(md5(concat(lit(prefix), col("id"))), 1, 15),
          16, 10).cast("long")
      val props = s.range(5000).select(col("id"),
        (h("neg-c-") % nc + 1).as("c"), (h("neg-s-") % ns + 1).as("sup"))
      val negs = props.join(edges,
          props("c") === edges("ec") && props("sup") === edges("es"),
          "left_anti")
        .orderBy(col("id").asc).limit(1000)
        .persist()
      val hits = negs.join(edges,
        negs("c") === edges("ec") && negs("sup") === edges("es")).count()
      val r = negs.agg(count(lit(1)).as("n"),
        expr("bit_xor(c * 100000 + sup)").as("ck")).head()
      negs.unpersist()
      Seq((1000L, r.getLong(0), hits, r.getLong(1), hits == 0))
        .toDF("n_requested", "n_selected", "real_hits", "sample_xor",
          "clean")
    }),

    // GROUP-level cross-validation folds — the split that prevents
    // the classic leakage bug: fold assignment is a pure function of
    // the GROUP key (md5(user) mod 5), so every event of a user lands
    // in one fold BY CONSTRUCTION, and the audit proves it holds
    // after the event-level assignment (count of users appearing in
    // >1 fold == 0). Narrow fold tagging (no join), one fold-keyed
    // report agg + one user-level audit agg.
    "q179_group_folds" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"))
        .withColumn("fold",
          (conv(substring(md5(col("user_id").cast("string")), 1, 15),
            16, 10).cast("long") % 5).cast("int"))
      val leak = ev.groupBy("user_id")
        .agg(countDistinct(col("fold")).as("nf"))
        .agg(sum(when(col("nf") > 1, 1L).otherwise(0L)).as("leak"))
        .head().getLong(0)
      val n = ev.count()
      ev.groupBy("fold").agg(
          countDistinct(col("user_id")).as("users"),
          count(lit(1)).as("events"))
        .withColumn("frac",
          round(col("events").cast("double") / n, 6))
        .withColumn("leaked_users", lit(leak))
    }),

    // Two-sample Kolmogorov–Smirnov drift statistic between the
    // 'click' and 'view' value distributions — the distribution-shift
    // alarm (q93's Jensen-Shannon works on token histograms; KS works
    // on CONTINUOUS values with no binning choice). Exact and
    // engine-identical: the statistic is max |C1·n2 − C2·n1| over the
    // merged distinct-value sweep — pure integers — divided once at
    // the end. The global running sums ride the shared
    // range-partitioned DistributedPrefix scan, never a single-task
    // window.
    "q180_ks_drift" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type"), col("value"))
      val grouped = ev.groupBy("value").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("d1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("d2"))
      val tot = grouped.agg(sum("d1"), sum("d2")).head()
      val (n1, n2) = (tot.getLong(0), tot.getLong(1))
      val parts = math.max(1, s.sparkContext.defaultParallelism)
      val ranged = grouped
        .repartitionByRange(parts, col("value").asc)
        .sortWithinPartitions("value")
        .as[(Double, Long, Long)]
      val ksNum = DistributedPrefix.scan(ranged, (0L, 0L),
        (a: (Long, Long), r: (Double, Long, Long)) =>
          (a._1 + r._2, a._2 + r._3),
        (x: (Long, Long), y: (Long, Long)) => (x._1 + y._1, x._2 + y._2)) {
        case ((c1, c2), (_, d1, d2)) =>
          math.abs((c1 + d1) * n2 - (c2 + d2) * n1)
      }.max()
      val ks = BigDecimal(ksNum.toDouble / (n1.toDouble * n2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((n1, n2, ksNum, ks)).toDF("n1", "n2", "ks_num", "ks")
    }),

    // EXACT tie-corrected ROC-AUC of the price signal against order
    // urgency — the Mann-Whitney rank-sum identity (AUC = (R_pos −
    // nP(nP+1)/2) / (nP·nN) with average ranks over tied scores), the
    // model-eval primitive q182's ranked-list metrics don't cover.
    // Everything is integer until ONE final division: with cb = rows
    // strictly below a tie group and m its size, twice the positive
    // rank-sum is Σ pos·(2·cb + m + 1), so auc_num = 2R − nP(nP+1) and
    // auc = auc_num / (2·nP·nN) — exact in both engines, tie-order
    // free (the sweep is over DISTINCT scores). Scale shape: one
    // group-by on score, then the global cumulative rides the same
    // range-partitioned DistributedPrefix scan as q180's KS sweep —
    // never a single-task window over the corpus.
    "q187_auc_exact" -> ((s, d) =>
      aucExact(Tables.load(s, d, "orders")
        .select(col("o_totalprice").as("score"),
          when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L)
            .as("p")))),

    // PER-SLICE AUC (the fairness / slice-evaluation audit: does the
    // score rank consistently across customer segments?) — q187's
    // rank-sum identity made fully declarative: grouping by (segment,
    // score) makes the within-segment sweep a per-segment WINDOW (a
    // segment-keyed exchange that scales with the number of slices),
    // so no driver scalar and no global sort anywhere. Same integer
    // algebra: auc_num = Σ pos·(2·cb + m + 1) − nP(nP+1), one final
    // division per segment. Degenerate slices (no positives or no
    // negatives) report NULL rather than a fabricated 0.5.
    "q189_group_auc" -> ((s, d) => {
      val seg = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val scored = Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_totalprice").as("score"),
          when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L)
            .as("p"))
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      val g = scored.groupBy("segment", "score")
        .agg(sum("p").as("pos"), count(lit(1)).as("m"))
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("segment").orderBy(col("score").asc)
      g.withColumn("cb", coalesce(sum("m")
          .over(w.rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
        .groupBy("segment").agg(
          sum("pos").as("n_pos"),
          (sum("m") - sum("pos")).as("n_neg"),
          sum(col("pos") * (lit(2) * col("cb") + col("m") + 1))
            .as("r2"))
        .select(col("segment"), col("n_pos"), col("n_neg"),
          (col("r2") - col("n_pos") * (col("n_pos") + 1)).as("auc_num"),
          when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
            .otherwise(round(
              (col("r2") - col("n_pos") * (col("n_pos") + 1))
                .cast("double")
                / (lit(2.0) * col("n_pos") * col("n_neg")), 6))
            .as("auc"))
    }),

    // CALIBRATION / reliability bins (the diagram behind "is the
    // score a probability?"): normalize the score by the global max
    // (one scalar agg, broadcast back), decile-bin, and report per
    // bin the mean score vs the empirical positive rate, their gap,
    // and the per-bin Brier term. Cross-engine exactness: per-row
    // score and squared-error terms are one double division each,
    // rounded to 6 and summed as DECIMAL (the q93/q176/q188 idiom);
    // every emitted mean divides an exact DECIMAL by an exact count.
    // One exchange (the bin agg) after the broadcast scalar.
    "q190_calibration_bins" -> ((s, d) => {
      val o = Tables.load(s, d, "orders")
        .select(col("o_totalprice").as("price"),
          when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L)
            .as("p"))
      val mx = o.agg(max("price").as("mx"))
      val sc = o.crossJoin(broadcast(mx))
        .withColumn("score", round(col("price") / col("mx"), 6))
        .withColumn("bin", least(floor(col("score") * 10), lit(9L))
          .cast("long"))
        .withColumn("sqerr",
          round(pow(col("score") - col("p"), 2), 6))
      sc.groupBy("bin").agg(
          count(lit(1)).as("n"),
          sum("p").as("n_pos"),
          round((sum(col("score").cast("decimal(28,6)"))
            / count(lit(1))).cast("double"), 6).as("mean_score"),
          round(sum("p").cast("double") / count(lit(1)), 6)
            .as("pos_rate"),
          round(sum(col("sqerr").cast("decimal(28,6)")).cast("double")
            / count(lit(1)), 6).as("brier"))
        .withColumn("abs_gap",
          round(abs(col("mean_score") - col("pos_rate")), 6))
    }),

    // EXACT average precision (the PR-curve twin of q187's ROC-AUC —
    // the metric that matters under class imbalance): AP = mean over
    // positives of precision at that positive's rank, under the
    // DETERMINISTIC total order (score desc, key asc) both engines
    // share. The global ranking never materializes: the same
    // range-partitioned DistributedPrefix scan carries (rows, pos)
    // cumulative counts, each positive emits round(precision, 9) as a
    // 9-dp DECIMAL, and the exact decimal sum divides once by nP.
    "q191_average_precision" -> ((s, d) =>
      averagePrecision(Tables.load(s, d, "orders")
        .select(col("o_totalprice").as("score"),
          col("o_orderkey").cast("long").as("k"),
          when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L)
            .as("p")))),

    // TIME-WEIGHTED average of the value signal per user (the metric
    // aggregation where observations hold until superseded — sensor /
    // price / gauge semantics, where a plain mean over-weights bursts):
    // each value is weighted by microseconds until the user's next
    // event; the last observation carries no interval. Weighted terms
    // are per-term rounded DECIMALs (exact sum, any order), the
    // denominator is an exact integer interval sum, one final double
    // division. One user_id exchange shared by the lead window and
    // the aggregation.
    "q176_twap" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("value"))
        .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id").agg(
          count(lit(1)).as("n_intervals"),
          sum("dt").as("span_us"),
          round(sum(round(col("value") * col("dt"), 6)
            .cast("decimal(28,6)")).cast("double")
            / sum("dt"), 6).as("twap"))
    }),

    // POINT-IN-TIME join against the q153 SCD2 dimension — the
    // composition that makes slowly-changing dimensions useful: every
    // event joins the state version that was VALID AT ITS TIMESTAMP
    // (valid_from <= ts < valid_to, open-ended current version). The
    // join is user-keyed with a per-user range residual — each user's
    // version list is change-bounded, so the match fan-in is tiny;
    // the gate additionally proves the SCD2 intervals TILE: exactly
    // one version matches every event. Counting matched ROWS alone
    // would let a double-match cancel a zero-match, so the gate pins
    // BOTH matched-row count == n AND distinct matched event ids == n
    // (together: every event matched, none matched twice), in one agg
    // over the join output. The attributed report is then one agg.
    "q174_pit_join" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us").asc, col("event_id").asc)
      val dim = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type").as("state"))
        .withColumn("prev", lag(col("state"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("state"))
        .withColumn("valid_to_us", lead(col("us"), 1).over(w))
        .select(col("user_id"), col("state"),
          col("us").as("valid_from_us"), col("valid_to_us"))
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ets"))
      val matched = ev.join(dim,
        ev("user_id") === dim("user_id")
          && col("valid_from_us") <= col("ets")
          && (col("valid_to_us").isNull
            || col("ets") < col("valid_to_us")))
      val n = ev.count()
      val gate = matched.agg(
        count(lit(1)).as("rows"),
        countDistinct(ev("event_id")).as("ids")).head()
      val exact = gate.getLong(0) == n && gate.getLong(1) == n
      matched.groupBy("state").agg(count(lit(1)).as("n_events"))
        .withColumn("tiling_exact", lit(exact))
        .select(col("state"), col("n_events"), col("tiling_exact"))
    }),

    // Table PROFILE — the one-pass column-statistics report every
    // data platform materializes before anything else touches a new
    // table: per column, null count, exact distinct count, min/max
    // rendered as strings. One wide aggregation (count-distinct
    // expands internally but the scan happens once); emitted in
    // long form (column, stat rows) so the schema is stable as
    // columns evolve.
    "q175_table_profile" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
      val cols = ProfileCols
      val aggs = cols.flatMap(k => Seq(
        sum(when(col(k).isNull, 1L).otherwise(0L)).as(s"${k}_nulls"),
        countDistinct(col(k)).as(s"${k}_ndv"),
        min(col(k)).cast("string").as(s"${k}_min"),
        max(col(k)).cast("string").as(s"${k}_max")))
      val row = c.agg(aggs.head, aggs.tail: _*).head()
      val n = c.count()
      cols.map(k => (k,
          n,
          row.getAs[Long](s"${k}_nulls"),
          row.getAs[Long](s"${k}_ndv"),
          row.getAs[String](s"${k}_min"),
          row.getAs[String](s"${k}_max")))
        .toDF("column", "n_rows", "nulls", "ndv", "min_s", "max_s")
    }),

    // SCHEMA EVOLUTION read: two parquet generations of the same
    // logical table — gen1 wrote (doc_id, source), gen2 added (lang,
    // n_chars) — unioned through mergeSchema, with the missing
    // columns of old files surfacing as NULLs the report must account
    // for exactly. This is the "old files never rewritten" half of
    // the lakehouse story (q139 is the versioning half): at 100TB you
    // evolve the schema forward and readers reconcile, you don't
    // rewrite exabytes. One scan over both generations, one agg.
    "q171_schema_evolution" -> ((s, d) => {
      val root = s"${scratch(d)}/schema_evo"
      val docs = Tables.load(s, d, "documents")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      ScratchGuard.ensure(s, root,
        docs.select("doc_id", "source", "lang", "n_chars"))(
        fs.exists(new org.apache.hadoop.fs.Path(s"$root/gen2/_SUCCESS"))) {
        docs.filter(col("doc_id") % 2 === 0)
          .select("doc_id", "source")
          .write.mode(SaveMode.Overwrite).parquet(s"$root/gen1")
        docs.filter(col("doc_id") % 2 === 1)
          .select("doc_id", "source", "lang", "n_chars")
          .write.mode(SaveMode.Overwrite).parquet(s"$root/gen2")
      }
      s.read.option("mergeSchema", "true")
        .parquet(s"$root/gen1", s"$root/gen2")
        .groupBy("source").agg(
          count(lit(1)).as("docs"),
          count(col("lang")).as("docs_with_lang"),
          sum(coalesce(col("n_chars"), lit(0L))).as("chars_known"))
    }),

    // Snapshot DIFF — the churn report between two q139 manifest
    // versions (what CDC consumers and incremental compactors read):
    // keyed full-outer on doc_id classifying added / removed /
    // changed / unchanged. Reads the REAL manifests (composes with
    // the snapshot layout, not its definition); one key-partitioned
    // join of two manifest-planned scans.
    "q172_snapshot_diff" -> ((s, d) => {
      import s.implicits._
      val snap = ensureSnapshots(s, d)
      val v1 = snap(1).select(col("doc_id"), col("n_chars").as("c1"))
      val v2 = snap(2).select(col("doc_id"), col("n_chars").as("c2"))
      val j = v1.join(v2, Seq("doc_id"), "full_outer")
      val r = j.agg(
        sum(when(col("c1").isNull, 1L).otherwise(0L)).as("added"),
        sum(when(col("c2").isNull, 1L).otherwise(0L)).as("removed"),
        sum(when(col("c1").isNotNull && col("c2").isNotNull
          && col("c1") =!= col("c2"), 1L).otherwise(0L)).as("changed"),
        sum(when(col("c1") === col("c2"), 1L).otherwise(0L))
          .as("unchanged")).head()
      val (n1, n2) = (snap(1).count(), snap(2).count())
      Seq((n1, n2, r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toDF("n_v1", "n_v2", "added", "removed",
        "changed", "unchanged")
    }),

    // Consistent-hashing shard assignment + RESHARD audit: docs map
    // to the first ring position clockwise of their hash (md5-derived
    // 60-bit ring, 16 shards), then the ring gains a 17th shard and
    // the report measures what FRACTION of docs moved — consistent
    // hashing's contract is ≈1/(S+1), where naive mod-hashing moves
    // ≈15/17. Ring tables are |shards| rows and broadcast; assignment
    // is one conditional aggregation per doc, no shuffle before the
    // single report agg.
    "q173_consistent_hash" -> ((s, d) => {
      def ringPos(c: Column): Column =
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      def assign(docs: DataFrame, shards: DataFrame): DataFrame =
        docs.crossJoin(broadcast(shards))
          .groupBy("doc_id")
          .agg(coalesce(
            min(when(col("spos") >= col("dpos"), col("spos"))),
            min(col("spos"))).as("shard_pos"))
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          ringPos(col("doc_id").cast("string")).as("dpos"))
      def shards(n: Int): DataFrame = {
        import s.implicits._
        (0 until n).map(i => i.toLong).toDF("shard_id")
          .select(col("shard_id"),
            ringPos(concat(lit("shard-"), col("shard_id"))).as("spos"))
      }
      val a16 = assign(docs, shards(16))
        .select(col("doc_id"), col("shard_pos").as("p16"))
      val a17 = assign(docs, shards(17))
        .select(col("doc_id"), col("shard_pos").as("p17"))
      a16.join(a17, "doc_id").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("p16") =!= col("p17"), 1L).otherwise(0L))
          .as("moved"),
        round(sum(when(col("p16") =!= col("p17"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("moved_frac"))
    }),

    // Trailing-window anomaly days (the volume-monitoring alarm every
    // ingestion pipeline runs): per-type daily counts, a 7-observed-
    // day trailing mean/variance (ROWS frame — exact integer sums,
    // the z-score is the only float), flag |z| > 2. One type-keyed
    // exchange for the daily agg + the trailing window; day emitted
    // as epoch days so the compare is calendar-free. The z formula is
    // written IDENTICALLY in both engines (s/c, (sq − s²/c)/c), so
    // the doubles agree bit-for-bit.
    "q167_anomaly_days" -> ((s, d) => {
      val tw = Window.partitionBy("event_type").orderBy(col("day").asc)
        .rowsBetween(-7, -1)
      val sd = sqrt((col("sq") - col("s") * col("s") / col("c"))
        / col("c"))
      Tables.load(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        .withColumn("s", sum("n").over(tw))
        .withColumn("sq", sum(col("n") * col("n")).over(tw))
        .withColumn("c", count(lit(1)).over(tw))
        .filter(col("c") >= 7)
        .filter(sd > 0 &&
          abs((col("n") - col("s") / col("c")) / sd) > 2)
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01").cast("date"))
            .as("day_epoch"),
          col("n"),
          round((col("n") - col("s") / col("c")) / sd, 6).as("z"))
    }),

    // Behavioral sequence motifs: top event-type TRIGRAMS over each
    // user's time-ordered stream (the n-gram LM idea applied to
    // behavior — funnels q111 checks are hypothesis-driven; motifs
    // SURFACE the hypotheses). Two lags on one user_id window (single
    // exchange, shared sort), then a partial+final count on a key
    // domain bounded by |types|³, and a TopN. Deterministic
    // (ts, event_id) order.
    "q166_event_motifs" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"))
        .withColumn("t2", lag(col("event_type"), 1).over(w))
        .withColumn("t3", lag(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("t3"), col("t2"), col("event_type"))
          .as("motif"))
        .groupBy("motif").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("motif").asc).limit(20)
    }),

    // Hopping event-time windows (6h size, 3h hop — each event lands
    // in exactly two windows) via Spark's NATIVE window() function:
    // the batch twin of the streaming watermark aggregations, and the
    // time-bucketing shape behind every training-telemetry dashboard.
    // One scan, window assignment map-side (a codegen'd expand to the
    // 2 hops), one partial+final agg; value sums ride DECIMAL so
    // float summation order can't differ between engines.
    "q160_hop_windows" -> ((s, d) =>
      Tables.load(s, d, "events")
        .groupBy(window(col("ts"), "6 hours", "3 hours"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6)
            .as("sum_value"))
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"), col("sum_value"))),

    // RENDEZVOUS-HASH SHARD ASSIGNMENT — the shard map that survives
    // topology changes (highest-random-weight / HRW hashing): owner =
    // argmax over shards of md5(doc:shard). The payoff is the
    // MINIMAL-DISRUPTION invariant this query proves end-to-end:
    // removing shard 7 moves exactly the docs shard 7 owned and
    // nothing else (a mod-N map would reshuffle ~15/16 of the
    // corpus). The 16-way explode collapses map-side via max(struct)
    // — both owners (before/after removal) computed in ONE aggregate,
    // no window; per-doc ties are impossible to matter because the
    // (h, shard) struct order is total.
    "q222_rendezvous_shards" -> ((s, d) =>
      rendezvousCensus(
        Tables.load(s, d, "documents").select(col("doc_id")),
        nShards = 16, removed = 7L)),

    // BORŮVKA MINIMUM SPANNING FOREST — the connectivity backbone at
    // minimum cost (network design, single-linkage clustering's
    // dendrogram skeleton), and the classic DISTRIBUTED MST: every
    // component picks its min incident edge in one map-side-combined
    // aggregate, so each round is two co-partitioned joins + one
    // min(struct) — components at least halve per round. Weighted
    // customer–supplier graph (the q203 edge set); distinct
    // (w, ku, kv) keys make the forest UNIQUE, so the oracle's
    // identical unrolled algebra must reproduce the exact tree —
    // pinned by the edge-set checksum, not just the total weight.
    "q223_boruvka_msf" -> ((s, d) => {
      val wEdges = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_quantity")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_custkey").cast("long") * 2).as("u"),
          (col("l_suppkey").cast("long") * 2 + 1).as("v"))
        .agg(min(col("l_quantity").cast("long")).as("w"))
      boruvkaMsf(wEdges, rounds = 5, jumps = 6)
    }),

    // DETERMINISTIC CORPUS SHUFFLE — the training-order permutation.
    // A 100 TB pretraining run needs a GLOBAL random document order
    // that is reproducible (same seed → same order), seekable (resume
    // at step k without replaying), and collision-free (hash keys tie;
    // ties make the order partitioning-dependent). A 4-round Feistel
    // network over 16-bit halves is a BIJECTION of [0, 2^32): sorting
    // by feistel(doc_id) IS the shuffle — a plain range-partitioned
    // sort, no RNG state, no tiebreak column. Output: the first 20
    // docs of the shuffled order plus an injectivity census
    // (n_keys = n_docs proves no key collides, so the order is total).
    "q224_feistel_shuffle" -> ((s, d) => {
      val keyed = Tables.load(s, d, "documents").select(col("doc_id"))
        .withColumn("skey", feistelKey(col("doc_id")))
      val cen = keyed.agg(count(lit(1)).as("n"),
        countDistinct(col("skey")).as("k")).head()
      val (nDocs, nKeys) = (cen.getLong(0), cen.getLong(1))
      // top-20 of the permuted order (TakeOrderedAndProject), then a
      // BOUNDED 20-row rank — the corpus is never globally windowed
      val w = Window.partitionBy(lit(1)).orderBy(col("skey").asc)
      keyed.orderBy(col("skey").asc).limit(20)
        .withColumn("rk", row_number().over(w))
        .select(col("rk"), col("doc_id"), col("skey"),
          lit(nDocs).as("n_docs"), lit(nKeys).as("n_keys"),
          lit(nDocs == nKeys).as("bijective"))
    }),

    // TEMPORAL BAND SELF-JOIN — the time twin of q207's spatial grid
    // blocking and the batch shape of the stream-stream join bound:
    // pairs of orders by the SAME customer placed within 7 days.
    // Naively |t1−t2| ≤ δ is a per-customer cross join; blocked on
    // bucket = day DIV 7, |d1−d2| ≤ 7 forces |bucket1−bucket2| ≤ 1,
    // so ONE side replicates to its 3 neighbor buckets and the join
    // is a plain (custkey, bucket) EQUI-join — hash-partitionable,
    // never nested-loop. Each qualifying pair survives exactly once:
    // one replica matches the probe bucket, and the okey< order keeps
    // one orientation. Output: exact day-gap histogram + distinct
    // customer census per gap — all integers.
    "q231_band_join" -> ((s, d) => {
      val o = Tables.load(s, d, "orders").select(
        col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        datediff(to_date(col("o_orderdate")),
          lit("1992-01-01").cast("date")).as("day"))
      val probe = o.withColumn("bucket", expr("day DIV 7"))
      val repl = o.select(col("ck").as("ck2"), col("ok").as("ok2"),
          col("day").as("day2"),
          explode(array(expr("day DIV 7 - 1"), expr("day DIV 7"),
            expr("day DIV 7 + 1"))).as("bucket"))
      repl.join(probe,
          col("ck2") === col("ck") && repl("bucket") === probe("bucket")
            && col("ok2") < col("ok")
            && abs(col("day2") - col("day")) <= 7)
        .groupBy(abs(col("day2") - col("day")).as("gap_days"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("ck")).as("n_customers"))
        .orderBy("gap_days")
    }),

    // ZONE-MAP PRUNING FORECAST — "sort your data" QUANTIFIED, the
    // lakehouse-planning twin of q220's join forecast: for a set of
    // range predicates on doc length, how many 1000-row shards could
    // a min/max zone map skip under (a) the ARRIVAL layout (shard =
    // doc_id range) vs (b) the length-SORTED layout — without ever
    // materializing layout (b): its per-shard min/max come from the
    // value-domain cumulative table alone (value v spans sorted
    // shards (cum−c) DIV S .. (cum−1) DIV S), the q163/q233
    // rank-selection discipline. Every count is an integer; the skip
    // ratio and exact selectivity divide once.
    "q236_zonemap_forecast" -> ((s, d) =>
      zonemapForecast(Tables.load(s, d, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("v")),
        shardSize = 1000L,
        preds = Seq((0L, 199L), (200L, 299L), (300L, 399L),
          (310L, 329L), (400L, 100000L)))),

    // CONSISTENT-HASH ring sharding (Karger et al. 1997) with 16
    // virtual nodes per physical node, plus the ELASTIC-RESHARD
    // audit: assignments under a 20-node ring vs the 21-node ring
    // that contains it (adding a node only ADDS ring points — the
    // property that bounds movement). The lookup is one codegen'd
    // filter over a 336-entry broadcast array literal per row — no
    // shuffle, no join; both engines position keys by the identical
    // md5 fingerprint, so the oracle replays the ring exactly. The
    // moved_in column is the decision number: adding node 21 moves
    // ~1/21 of keys, all INTO the new node — rehash-mod-n would move
    // 20/21 of them.
    "q271_consistent_hash" -> ((s, d) => {
      def md5Long(str: String): Long = {
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(str.getBytes("UTF-8"))
        java.lang.Long.parseLong(
          dig.map(b => f"$b%02x").mkString.substring(0, 15), 16)
      }
      def ringOf(nodes: Int): Seq[(Long, Int)] =
        (for { n <- 0 until nodes; v <- 0 until 16 }
          yield (md5Long(s"node-$n-v$v"), n)).sortBy(_._1)
      def assign(ring: Seq[(Long, Int)], h: Column): Column = {
        val arr = array(ring.map { case (p, n) =>
          struct(lit(p).as("p"), lit(n).as("n")) }: _*)
        coalesce(
          try_element_at(filter(arr, x => x.getField("p") >= h), lit(1))
            .getField("n"),
          lit(ring.head._2)) // wraparound: smallest ring position
      }
      val h = conv(substring(md5(concat(lit("doc-"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
      val asg = Tables.load(s, d, "documents").select(col("doc_id"))
        .withColumn("a", assign(ringOf(20), h))
        .withColumn("b", assign(ringOf(21), h))
      val aN = asg.groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("n_a"))
      val bN = asg.groupBy(col("b").as("node"))
        .agg(count(lit(1)).as("n_b"),
          sum(when(col("a") =!= col("b"), 1L).otherwise(0L))
            .as("moved_in"))
      s.range(21).select(col("id").cast("int").as("node"))
        .join(aN, Seq("node"), "left")
        .join(bN, Seq("node"), "left")
        .select(col("node"), coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"),
          coalesce(col("moved_in"), lit(0L)).as("moved_in"))
        .orderBy("node")
    }),

    // ROLLING 7-DAY EXACT DISTINCT USERS — the sliding-window COUNT
    // DISTINCT no sketch gets exact and no window frame computes
    // without a per-day rescan: each event covers the 7 window-end
    // days it contributes to, so ONE constant 7-way explode + keyed
    // agg yields every day's exact trailing-week census — one
    // shuffle on the day key, no self-join, no global window, output
    // bounded by the date domain. Cover days clipped to the observed
    // range so every emitted window is fully defined.
    "q247_rolling_distinct" -> ((s, d) => {
      val e = Tables.load(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .localCheckpoint(true) // feeds the bounds AND the explode
      val b = e.agg(min("day"), max("day")).head()
      val (lo, hi) = (b.getDate(0), b.getDate(1))
      e.select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"), col("day"))
        .select(col("user_id"),
          date_add(col("day"), col("i")).as("win_end"))
        .filter(col("win_end") >= lit(lo) && col("win_end") <= lit(hi))
        .groupBy("win_end")
        .agg(countDistinct(col("user_id")).as("users_7d"),
          count(lit(1)).as("events_7d"))
        .orderBy("win_end")
    })
  )

  /** q236's forecast over a (doc_id, v) frame: per (layout,
    * predicate), shard census, zone-map-skippable shard count, and
    * the exact row selectivity. ScaleOpsSpec pins the closed forms on
    * a crafted frame (sorted layout skips everything outside the
    * value band; arrival layout with interleaved values skips
    * nothing) and the span-table identity (Σ spans == shard count
    * when every shard is non-empty). */
  private[graft] def zonemapForecast(rows: DataFrame, shardSize: Long,
      preds: Seq[(Long, Long)]): DataFrame = {
    val s = rows.sparkSession
    // layout (a): arrival shards, one keyed agg
    val arrival = rows.groupBy(expr(s"doc_id DIV $shardSize").as("shard"))
      .agg(min("v").as("mn"), max("v").as("mx"))
    // layout (b): sorted-shard stats from the value-domain cumulative
    // table — the |domain|-sized bounded rank (q224 idiom), never a
    // per-row global sort
    val w = Window.partitionBy(lit(1)).orderBy(col("v").asc)
    val spans = rows.groupBy("v").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(w))
      .select(col("v"), explode(sequence(
        expr(s"(cum - c) DIV $shardSize"),
        expr(s"(cum - 1) DIV $shardSize"))).as("shard"))
    val sorted = spans.groupBy("shard")
      .agg(min("v").as("mn"), max("v").as("mx"))
    val predCol = explode(array(preds.map { case (lo, hi) =>
      struct(lit(lo).as("lo"), lit(hi).as("hi")) }: _*))
    def forecast(stats: DataFrame, layout: String): DataFrame = stats
      .select(col("mn"), col("mx"), predCol.as("p"))
      .groupBy(col("p.lo").as("lo"), col("p.hi").as("hi"))
      .agg(count(lit(1)).as("n_shards"),
        sum(when(col("mx") < col("p.lo") || col("mn") > col("p.hi"),
          1L).otherwise(0L)).as("n_skipped"))
      .withColumn("layout", lit(layout))
    // exact selectivity per predicate: one conditional-sum scan
    val selRow = rows.agg(count(lit(1)).as("n"),
      preds.map { case (lo, hi) =>
        sum(when(col("v") >= lo && col("v") <= hi, 1L).otherwise(0L))
          .as(s"m_${lo}_$hi") }: _*).head()
    val n = selRow.getLong(0)
    val sel = preds.zipWithIndex.map { case ((lo, hi), i) =>
      (lo, hi, selRow.getLong(i + 1)) }
    import s.implicits._
    val selDf = broadcast(sel.toDF("lo", "hi", "n_match"))
    forecast(arrival, "arrival").union(forecast(sorted, "sorted"))
      .join(selDf, Seq("lo", "hi"))
      .select(col("layout"), col("lo"), col("hi"), col("n_shards"),
        col("n_skipped"),
        round(col("n_skipped").cast("double")
          / col("n_shards").cast("double"), 6).as("skip_ratio"),
        col("n_match"),
        round(col("n_match").cast("double") / lit(n.toDouble), 6)
          .as("selectivity"))
      .orderBy(col("layout"), col("lo"))
  }

  /** q224's permutation key: 4-round balanced Feistel over 16-bit
    * halves — a bijection of [0, 2^32) built from pure codegen integer
    * arithmetic (Luby–Rackoff construction; the round function is a
    * Knuth multiplicative hash of the right half + round key, high 16
    * bits kept). Bijective because every round is invertible:
    * (L,R) → (R, L xor F(R,K)) undoes with the SAME F. No float, no
    * RNG, no tiebreak — equal inputs are impossible, so sorting by the
    * key gives a total deterministic order under any partitioning. */
  private[graft] def feistelKey(id: Column): Column = {
    val roundKeys = Seq(40503L, 11665L, 30841L, 22621L)
    val l0 = shiftright(id, 16)
    val r0 = id.bitwiseAND(lit(65535L))
    val (l4, r4) = roundKeys.foldLeft((l0, r0)) { case ((l, r), k) =>
      val f = shiftright(
        ((r + lit(k)) * lit(2654435761L)) % lit(4294967296L), 16)
      (r, l.bitwiseXOR(f))
    }
    l4 * lit(65536L) + r4
  }

  /** q222's HRW census over an id frame: per-shard doc counts before
    * and after removing shard `removed`, the exact moved mass, and
    * the minimal-disruption flag (moved == docs the removed shard
    * owned — HRW's defining property; a mod-N map moves ~(n−1)/n of
    * everything). Both owners come from ONE max(struct) aggregate —
    * the (h, shard) order is total, so no tiebreak ambiguity exists
    * in either engine. Split out so ScaleOpsSpec pins the invariant
    * and the stay-put property on a fixture. */
  private[graft] def rendezvousCensus(ids: DataFrame, nShards: Int,
      removed: Long): DataFrame = {
    val s = ids.sparkSession
    import s.implicits._
    val shards = broadcast((0L until nShards.toLong).toDF("shard"))
    val h = conv(substring(md5(concat_ws(":", lit("rvh"),
      col("doc_id"), col("shard"))), 1, 12), 16, 10).cast("long")
    val owners = ids.crossJoin(shards).withColumn("h", h)
      .groupBy("doc_id")
      .agg(max(struct(col("h"), col("shard")))
          .getField("shard").as("owner16"),
        max(when(col("shard") =!= removed,
            struct(col("h"), col("shard"))))
          .getField("shard").as("owner15"))
      .localCheckpoint(true)
    val gate = owners.agg(
      sum(when(col("owner16") =!= col("owner15"), 1L).otherwise(0L)),
      sum(when(col("owner16") === removed, 1L).otherwise(0L))).head()
    val (nMoved, nOnRemoved) = (gate.getLong(0), gate.getLong(1))
    val before = owners.groupBy(col("owner16").as("shard"))
      .agg(count(lit(1)).as("n_before"))
    val after = owners.groupBy(col("owner15").as("shard"))
      .agg(count(lit(1)).as("n_after"),
        sum(when(col("owner16") === removed, 1L).otherwise(0L))
          .as("n_gained"))
    before.join(after, Seq("shard"), "full_outer")
      .na.fill(0L, Seq("n_before", "n_after", "n_gained"))
      .withColumn("total_moved", lit(nMoved))
      .withColumn("minimal_disruption", lit(nMoved == nOnRemoved))
      .orderBy("shard")
  }

  /** The q139 snapshot layout, built once per (JVM, dataset) behind a
    * ScratchGuard signature: version = immutable file list (manifest);
    * the v2 append adds files + a manifest and never rewrites v1.
    * Returns the snapshot reader. Shared by q139 (version stability)
    * and q172 (version DIFF). */
  private[graft] def ensureSnapshots(s: SparkSession, d: String)
      : Int => DataFrame = {
    val root = s"${scratch(d)}/snapshots"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def manifest(v: Int) = new org.apache.hadoop.fs.Path(
      s"$root/manifest_v$v.txt")
    def listParts(p: String): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .map(_.getPath.toString).filter(_.endsWith(".parquet"))
        .sorted.toSeq
    def writeManifest(v: Int, files: Seq[String]): Unit =
      graft.Util.writeSmallFile(s, manifest(v), files.mkString("\n"))
    // SELF-INVALIDATING build guard (ScratchGuard): the scratch dir
    // outlives the driver's parquet regeneration (the r5 events.ts
    // lesson), so "manifest exists" alone would serve a stale
    // snapshot of an old table generation.
    ScratchGuard.ensure(s, root,
      Tables.load(s, d, "documents").select("doc_id", "n_chars"))(
      fs.exists(manifest(2))) {
      val base = Tables.load(s, d, "documents").select("doc_id", "n_chars")
      base.write.mode(SaveMode.Overwrite).parquet(s"$root/v1data")
      val f1 = listParts(s"$root/v1data")
      writeManifest(1, f1)
      // the append: a NEW file set, ids offset so v2 is a strict
      // superset with disjoint keys — v1's files are never touched
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("n_chars"))
        .write.mode(SaveMode.Overwrite).parquet(s"$root/v2delta")
      writeManifest(2, f1 ++ listParts(s"$root/v2delta"))
    }
    (v: Int) => s.read.parquet(
      graft.Util.readSmallFile(s, manifest(v)).split("\n").toSeq: _*)
  }

  /** Degree-oriented wedge-join triangle counting over a distinct
    * (u, v) u<v edge frame — the q125 machinery, split out so
    * GraphScaleBench can run it on generated million-edge graphs with
    * planted ground truth. Returns (nodes, edges, triangles, total
    * wedges). Degrees broadcast (vertex-table sized; co-partitioned
    * fallback documented at q125); each wedge is counted once via the
    * (deg, id) total order. */
  private[graft] def triangleStats(edgesIn: DataFrame)
      : (Long, Long, Long, Long) = {
    val edges = edgesIn.cache() // reused 3x: degrees, orientation, count
    val deg = edges.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
      .cache() // |V| rows — vertex-table sized, not edge sized
    // nodes + wedge total in ONE pass over the degree table
    val degStats = deg.agg(count(lit(1)),
      sum(col("deg") * (col("deg") - lit(1L)))).head()
    // the node count just computed gates the degree broadcast (the
    // pageRankFixedPoint idiom — a vertex table GROWS, so the hint
    // must be a runtime decision, never mandatory)
    def bc(df: DataFrame): DataFrame =
      if (degStats.getLong(0) <= broadcastRowLimit(16)) broadcast(df)
      else df
    val keyed = edges
      .join(bc(deg.select(col("n").as("u"), col("deg").as("du"))), "u")
      .join(bc(deg.select(col("n").as("v"), col("deg").as("dv"))), "v")
    // Orient toward the (deg, id)-larger endpoint; carry the target's
    // order key so wedge endpoints can be ordered without a re-join.
    val dir = keyed.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("s"), col("v").as("t"),
          struct(col("dv").as("dt"), col("v").as("tid")).as("kt")))
      .otherwise(
        struct(col("v").as("s"), col("u").as("t"),
          struct(col("du").as("dt"), col("u").as("tid")).as("kt")))
      .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.kt").as("kt"))
      .cache() // read by three branches: both wedge sides + closer
    val e1 = dir.select(col("s"), col("t").as("a"), col("kt").as("ka"))
    val e2 = dir.select(col("s"), col("t").as("b"), col("kt").as("kb"))
    val wedge = e1.join(e2, "s").filter(col("ka") < col("kb"))
      .select(col("a"), col("b"))
    val closer = dir.select(col("s").as("a"), col("t").as("b"))
    val nTri = wedge.join(closer, Seq("a", "b")).count()
    val nNodes = degStats.getLong(0)
    val nEdges = edges.count()
    val wedgeTot = degStats.getLong(1) / 2
    dir.unpersist(); deg.unpersist(); edges.unpersist()
    (nNodes, nEdges, nTri, wedgeTot)
  }

  /** One synchronous LPA update: every dst adopts the most frequent
    * label among its in-neighbors, ties to the SMALLEST label. The
    * label join has the same broadcast↔co-partition switch as the
    * PageRank loop: `broadcastLabels = true` (the q157 default —
    * community tables at query scale are dimension-sized) ships the
    * label table to every executor; `false` shuffle-joins edges and
    * labels on the node key, the only shape that survives node counts
    * past sensible broadcast (the 1M-node GraphScaleBench uses it —
    * broadcasting a million-row table per round is a memory cliff).
    * Either way the argmax window runs over node-sized (dst, lbl)
    * counts. Split out so ScaleOpsSpec pins the frequency-beats-order
    * and tie rules on crafted label states. */
  private[graft] def lpaRound(edges: DataFrame, labels: DataFrame,
      broadcastLabels: Boolean = true): DataFrame = {
    val lbl = if (broadcastLabels) broadcast(labels) else labels
    val cnt = edges.join(lbl, edges("src") === labels("v"))
      .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("dst")
      .orderBy(col("cnt").desc, col("lbl").asc)
    cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("dst").as("v"), col("lbl"))
  }

  /** Gap-based sessions (8h inactivity): one user_id exchange carries
    * the boundary lag, the session-id running count, and the
    * per-session aggregate (the groupBy keys are supersets of the
    * window partitioning, so no re-shuffle). Shared by q150 and the
    * q154 sweep-line. */
  private[graft] def sessions(s: SparkSession, d: String): DataFrame =
    sessionsOf(Tables.load(s, d, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us")))

  /** [[sessions]] over any (user_id, event_id, us) frame — split out so
    * ScaleOpsSpec can pin the boundary semantics (gap strictly greater
    * than 8h opens a session; ties ordered by event_id) on synthetic
    * streams. */
  private[graft] def sessionsOf(ev: DataFrame): DataFrame = {
    val GapUs = 8L * 3600L * 1000000L
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("event_id").asc)
    ev
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull
          || col("us") - lag(col("us"), 1).over(w) > GapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id").agg(
        min("us").as("a_us"), max("us").as("b_us"),
        count(lit(1)).as("n_events"))
  }

  /** Sweep-line max-concurrency over session intervals [a_us, b_us]
    * (inclusive ends: a session ending the instant another starts
    * counts as concurrent — +1 deltas sort before −1 at equal t). The
    * global running sum is the shared range-partitioned two-phase
    * prefix scan, never a single-task window. */
  private[graft] def peakConcurrency(sess: DataFrame): DataFrame = {
    val s = sess.sparkSession
    import s.implicits._
    val deltas = sess.select(col("a_us").as("t"), lit(1L).as("dlt"))
      .unionByName(sess.select(col("b_us").as("t"), lit(-1L).as("dlt")))
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = deltas
      .repartitionByRange(parts, col("t").asc, col("dlt").desc)
      .sortWithinPartitions(col("t").asc, col("dlt").desc)
      .as[(Long, Long)]
    val run = DistributedPrefix.scan(ranged, 0L,
      (a: Long, r: (Long, Long)) => a + r._2,
      (x: Long, y: Long) => x + y) {
      case (before, (t, dl)) => (t, before + dl)
    }.toDF("t", "run")
    run.orderBy(col("run").desc, col("t").asc).limit(1)
      .crossJoin(broadcast(sess.agg(count(lit(1)).as("n_sessions"))))
      .select(col("run").as("peak_concurrency"), col("t").as("at_us"),
        col("n_sessions"))
  }

  /** Two-phase distributed skyline (Pareto frontier: minimize col 2,
    * maximize col 3; col 1 is the row key). Phase 1 sweeps a LOCAL
    * frontier per partition (sort + one pass, narrow); phase 2 takes
    * the global frontier of the tiny candidate union with one window
    * over its per-price groups — correct for any input partitioning
    * because the global frontier is a subset of every
    * union-of-local-frontiers. Ties on both dimensions are all kept
    * (no strict dominator). ScaleOpsSpec pins partition-independence
    * and the tie cases adversarially. */
  def skyline(pts: DataFrame): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    val Seq(kc, pc, sc) = pts.columns.toSeq
    val local = pts
      .select(col(kc).cast("long"), col(pc).cast("double"), col(sc).cast("int"))
      .as[(Long, Double, Int)]
      .mapPartitions { it =>
        val rows = it.toArray.sortBy(r => (r._2, -r._3))
        val out = scala.collection.mutable.ArrayBuffer[(Long, Double, Int)]()
        var maxCheaper = Int.MinValue // max size over strictly lower prices
        var groupPrice = Double.NaN
        var groupMax = Int.MinValue // max size within the current price
        var i = 0
        while (i < rows.length) {
          val r = rows(i)
          if (r._2 != groupPrice) {
            maxCheaper = math.max(maxCheaper, groupMax)
            groupPrice = r._2; groupMax = r._3
          }
          if (r._3 > maxCheaper && r._3 == groupMax) out += r
          i += 1
        }
        out.iterator
      }
      .toDF(kc, pc, sc)
    val grp = local.groupBy(pc).agg(max(sc).as("gmax"))
    // phase 2: running "max size over strictly cheaper prices" WITHOUT
    // a global single-partition window (the old shape tripped
    // `WindowExec: No Partition Defined` on every run): range-partition
    // the per-price maxima (partition i holds lower prices than i+1)
    // and run the shared two-phase broadcast-prefix scan
    // ([[DistributedPrefix.scan]], same idiom as q77/q136), so the
    // frontier never has to fit one task. Int.MinValue = "no cheaper
    // price exists": `sc > MinValue` is always true, the same
    // keep-rule the old NULL check expressed.
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val ranged = grp
      .select(col(pc).cast("double").as("__p"), col("gmax").cast("int").as("__g"))
      .repartitionByRange(parts, col("__p"))
      .sortWithinPartitions("__p")
      .as[(Double, Int)]
    val thresh = DistributedPrefix.scan(ranged, Int.MinValue,
      (m: Int, t: (Double, Int)) => math.max(m, t._2),
      (x: Int, y: Int) => math.max(x, y)) {
      case (before, (p, g)) => (p, g, before)
    }.toDF("__p", "__g", "__maxc")
    // keyed equi-join, NOT broadcast: thresh is sized by the number of
    // DISTINCT prices — a data-domain cardinality with no a-priori
    // bound. Both sides are frontier-sized, so the keyed shuffle is
    // tiny; Catalyst/AQE may still choose to broadcast when the stats
    // justify it, but nothing here assumes the domain fits the driver.
    local.join(thresh, local(pc) === col("__p"))
      .filter(col(sc) === col("__g") && col(sc) > col("__maxc"))
      .select(col(kc), col(pc), col(sc))
  }

  /** q187's exact tie-corrected ROC-AUC over a (score: double,
    * p: 0/1 long) frame — the Mann-Whitney rank-sum identity with
    * average ranks for tied scores, all-integer until one final
    * division. Split out so ScaleOpsSpec pins the tie correction and
    * the degenerate-AUC closures (perfect ranking → 1, reversed → 0,
    * all-tied → 0.5) on crafted rows. */
  private[graft] def aucExact(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val grouped = scored
      .groupBy("score").agg(sum("p").as("pos"), count(lit(1)).as("m"))
    val tot = grouped.agg(sum("pos"), sum("m")).head()
    val (nP, n) = (tot.getLong(0), tot.getLong(1))
    val nN = n - nP
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = grouped
      .repartitionByRange(parts, col("score").asc)
      .sortWithinPartitions("score")
      .as[(Double, Long, Long)]
    val r2 = DistributedPrefix.scan(ranged, 0L,
      (a: Long, r: (Double, Long, Long)) => a + r._3,
      (x: Long, y: Long) => x + y) {
      case (cb, (_, pos, m)) => pos * (2 * cb + m + 1)
    }.sum().toLong
    val aucNum = r2 - nP * (nP + 1)
    val auc = BigDecimal(aucNum.toDouble / (2.0 * nP * nN))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((nP, nN, aucNum, auc)).toDF("n_pos", "n_neg", "auc_num", "auc")
  }

  /** q195's per-class total-variation distance over a (nat, bal_band,
    * seg) frame: one row per class with its exact integer numerator
    * tnum = Σ_s |cnt·N − k·g_s| (zero cells included via the class ×
    * sensitive grid) and t = tnum / (2·k·N). Split out so
    * ScaleOpsSpec pins the closures: a single-class table reads t = 0
    * (the class IS the global distribution) and a perfectly-separated
    * two-class/two-value table reads t = 0.5 each. */
  private[graft] def tClosenessPerClass(c: DataFrame): DataFrame = {
    val n = c.count()
    val cls = c.groupBy("nat", "bal_band", "seg")
      .agg(count(lit(1)).as("cnt"))
    val kTab = cls.groupBy("nat", "bal_band").agg(sum("cnt").as("k"))
    val gTab = c.groupBy("seg").agg(count(lit(1)).as("g"))
    kTab.crossJoin(broadcast(gTab))
      .join(cls, Seq("nat", "bal_band", "seg"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("term", abs(col("cnt") * n - col("k") * col("g")))
      .groupBy("nat", "bal_band")
      .agg(max("k").as("k"), sum("term").as("tnum"))
      .withColumn("t", round(col("tnum").cast("double")
        / (lit(2.0) * col("k") * lit(n)), 6))
  }

  /** q197's fixpoint peel: the k-core of a SYMMETRIC (src, dst) edge
    * table, as one row (k, n_core, n_core_edges, id_sum, rounds).
    * `rounds` counts peel iterations INCLUDING the confirming one
    * (the round whose peel frontier is empty is the fixpoint).
    *
    * Degrees are maintained INCREMENTALLY: a (v, deg) table holds
    * each alive node's degree in the alive subgraph, and each round
    * decrements only the peeled frontier's neighbors instead of
    * recomputing alive-degrees from the full edge set. Every edge
    * CONTRIBUTES a decrement at most once across ALL rounds (when its
    * first endpoint peels — decrements to already-peeled or
    * same-round-peeled endpoints drop in the anti-join), so total
    * decrement volume is O(E), not O(rounds·E); on deep peels that
    * recompute was a measured 2-3×. (The per-round frontier probe of
    * the edge table is a broadcast-side scan below the budget; above
    * it, a bucketed edge layout would keep the fallback join
    * co-located.) The peel sequence is IDENTICAL to the
    * recompute formulation — both remove exactly {v : deg_alive(v)
    * < k} per round — so rounds, membership and checksums are
    * unchanged. Split out so ScaleOpsSpec pins the cascade: a
    * 4-clique with a 3-node tail chain peels one tail node per round
    * at k = 2 (rounds = 4), collapses in one at k = 3, and empties
    * at k = 4. */
  private[graft] def kCore(edges: DataFrame, k: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // checkpointed frames read as HUGE to the planner (LogicalRDD
    // default stats), so un-hinted per-round joins against the
    // node-sized degree table plan as full shuffles — the dominant
    // cost of the peel. Both per-round sides are RIGOROUSLY bounded
    // by the alive-node count (the frontier is a subset of the
    // degree table; decrements group BY node), so when the alive set
    // fits the broadcast budget every round is one edges scan +
    // degree-table scans + ONE materialization (the new degree
    // table), zero exchanges — the q157 lpaRound broadcast-switch
    // idiom. Termination rides the materialization's own count
    // (|deg'| == |deg| ⟺ empty frontier), so a round spends no
    // separate frontier-count job.
    val BcastMax = 2000000L
    def side(df: DataFrame, cnt: Long) =
      if (cnt <= BcastMax) broadcast(df) else df
    var deg = edges.groupBy(col("src").as("v"))
      .agg(count(lit(1)).as("deg")).localCheckpoint(true)
    var n = deg.count()
    var rounds = 0
    var done = false
    while (!done) {
      rounds += 1
      // the frontier is a cheap filter over the CHECKPOINTED degree
      // table — recomputed lazily by its two consumers (in-memory
      // scans beat materializing another table per round)
      val peeled = deg.filter(col("deg") < k).select("v")
      // edges incident to the frontier, counted toward the OTHER
      // endpoint; decrements aimed at nodes peeled this round or
      // earlier vanish in the anti-joined table's left join
      val dec = edges
        .join(side(peeled.select(col("v").as("src")), n), Seq("src"))
        .groupBy(col("dst").as("v")).agg(count(lit(1)).as("dec"))
      val next = deg.join(side(peeled, n), Seq("v"), "left_anti")
        .join(side(dec, n), Seq("v"), "left")
        .select(col("v"),
          (col("deg") - coalesce(col("dec"), lit(0L))).as("deg"))
        .localCheckpoint(true)
      val m = next.count()
      done = m == n
      deg = next
      n = m
    }
    // the maintained degrees ARE the alive-subgraph degrees at
    // fixpoint (the invariant the peel rests on), so the core's edge
    // count is Σdeg/2 straight off the table — no edges re-join, no
    // survivor broadcast; one aggregate job closes the census
    val fin = deg.agg(sum("deg"), sum("v")).head()
    val ne = if (fin.isNullAt(0)) 0L else fin.getLong(0) / 2
    val idSum = if (fin.isNullAt(1)) 0L else fin.getLong(1)
    Seq((k, n, ne, idSum, rounds))
      .toDF("k", "n_core", "n_core_edges", "id_sum", "rounds")
  }

  /** q203's Bellman-Ford relaxation over a SYMMETRIC weighted
    * (src, dst, w) edge table from a (v, dist) seed frontier: each
    * round takes the element-wise min of the previous distances and
    * every one-edge extension. Returns the LAST TWO rounds so the
    * caller can flag convergence. Split out so ScaleOpsSpec pins the
    * relaxation on a hand-walked weighted path (a longer-hop cheaper
    * route must win once enough rounds allow it). */
  /** q223's Borůvka minimum spanning forest over canonical
    * UNDIRECTED edges (ku < kv, one row per edge, DISTINCT (w,ku,kv)
    * keys — the lexicographic total order makes the MSF unique, so
    * Borůvka and Kruskal agree and both engines produce the SAME
    * tree, not just the same weight). Per round: each component
    * selects its minimum incident cross edge (one partial+final
    * min(struct) aggregate — map-side combined, never a window),
    * selected pointers form a functional graph whose only cycles are
    * 2-cycles (mutual minima under a total order), broken by rooting
    * the smaller id; `jumps` pointer-doubling steps contract the
    * merge forest. Budgets are HONEST: `fully_contracted` records
    * that every round's pointer forest reached fixpoint and
    * `converged` that no cross-component edge survived — an
    * undersized budget is a visible false, never a silent wrong
    * tree (the q203 idiom). Returns the one-row census including an
    * edge-set checksum (Σ ku·10⁶ + kv) that pins the exact tree. */
  private[graft] def boruvkaMsf(edges0: DataFrame, rounds: Int,
      jumps: Int): DataFrame = {
    val s = edges0.sparkSession
    import s.implicits._
    // localCheckpoint PRESERVES origin size statistics, and pointer
    // doubling SELF-joins p with p — Catalyst's size estimate is the
    // product of the children's, so each jump SQUARES the BigInt
    // sizeInBytes: 30 jumps ⇒ a billion-bit BigInteger and planner
    // overflow. Rebasing through createDataFrame(rdd, schema) resets
    // the stat to the default, keeping every estimate bounded.
    def rebased(df: DataFrame): DataFrame = {
      val ck = df.localCheckpoint(true)
      s.createDataFrame(ck.rdd, ck.schema)
    }
    val edges = rebased(edges0.select(
      least(col("u"), col("v")).as("ku"),
      greatest(col("u"), col("v")).as("kv"), col("w")))
    // e2 is STATIC across all rounds and is only ever joined on x —
    // hash-partition it by x before its one-time checkpoint (a plain
    // localCheckpoint, which PRESERVES partitioning info, unlike
    // rebased) so every round's labeling join and the final leftover
    // audit reuse the layout instead of re-shuffling 2|E| rows per
    // round. e2 is never self-joined, so the stat-squaring hazard
    // rebased() exists for does not apply to it: its lab products
    // multiply against rebased (default-stat) comp sides only.
    val e2 = edges.select(col("ku").as("x"), col("kv").as("y"),
        col("w"), col("ku"), col("kv"))
      .unionByName(edges.select(col("kv").as("x"), col("ku").as("y"),
        col("w"), col("ku"), col("kv")))
      .repartition(col("x"))
      .localCheckpoint(true)
    val nodes = rebased(edges.select(col("ku").as("v"))
      .unionByName(edges.select(col("kv").as("v"))).distinct())
    var comp = rebased(nodes.select(col("v"), col("v").as("c")))
    var tree = rebased(Seq.empty[(Long, Long, Long)]
      .toDF("ku", "kv", "w"))
    var allContracted = true
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      r += 1
      val lab = e2
        .join(comp.select(col("v").as("x"), col("c").as("cs")), "x")
        .join(comp.select(col("v").as("y"), col("c").as("cd")), "y")
        .filter(col("cs") =!= col("cd"))
      val sel = rebased(lab.groupBy("cs")
        .agg(min(struct(col("w"), col("ku"), col("kv"), col("cd")))
          .as("m"))
        .select(col("cs").as("c"), col("m.cd").as("t"),
          col("m.w").as("w"), col("m.ku").as("ku"),
          col("m.kv").as("kv")))
      if (sel.isEmpty) {
        // no cross-component edge anywhere: the forest is final and
        // the remaining rounds are no-ops in both engines
        converged = true
      } else {
        tree = rebased(tree
          .unionByName(sel.select("ku", "kv", "w").distinct()))
        val comps = comp.select(col("c")).distinct()
        val p0 = rebased(comps
          .join(sel.select(col("c"), col("t")), Seq("c"), "left")
          .select(col("c"), coalesce(col("t"), col("c")).as("t")))
        // break the 2-cycles a total-order min selection can create:
        // the smaller endpoint becomes its own root
        var p = rebased(p0.as("a")
          .join(p0.select(col("c").as("t"), col("t").as("tt")), "t")
          .select(col("c"),
            when(col("tt") === col("c") && col("c") < col("t"),
              col("c")).otherwise(col("t")).as("t")))
        var j = 0
        var settled = false
        while (j < jumps && !settled) {
          j += 1
          // one self-join per jump: keep BOTH the parent (t) and the
          // grandparent (t2) in the checkpointed output, so the
          // pre-jump idempotency check (t2 == t everywhere ⟺ this
          // jump changed nothing ⟺ p was already settled) is a cheap
          // filter scan of the SAME materialized frame instead of a
          // second self-join per jump (at ring depth ~1000 the loop
          // runs ~10 jumps, so that was ~10 extra |C|-row shuffle
          // joins per round). The check lags one jump behind the old
          // post-jump one, so the loop may spend one extra no-op
          // jump on an unchanged p — still j+1 joins total vs 2j.
          val hop = rebased(p.as("a")
            .join(p.select(col("c").as("t"), col("t").as("t2")), "t")
            .select(col("c"), col("t"), col("t2")))
          p = hop.select(col("c"), col("t2").as("t"))
          settled = hop.filter(col("t2") =!= col("t")).isEmpty
        }
        // budget exhausted without the lagged check firing: decide
        // settledness of the FINAL p explicitly (one join), exactly
        // the old post-jump semantics — the harness's ring corpus
        // converges precisely on the last allowed jump, where the
        // lagged check alone would misreport fully_contracted=false
        if (!settled)
          settled = p
            .join(p.select(col("c").as("t"), col("t").as("t2")), "t")
            .filter(col("t2") =!= col("t")).isEmpty
        if (!settled) allContracted = false
        comp = rebased(comp
          .join(p.select(col("c"), col("t").as("nc")), "c")
          .select(col("v"), col("nc").as("c")))
      }
    }
    val leftover = e2
      .join(comp.select(col("v").as("x"), col("c").as("cs")), "x")
      .join(comp.select(col("v").as("y"), col("c").as("cd")), "y")
      .filter(col("cs") =!= col("cd")).count()
    val nNodes = nodes.count()
    val nComp = comp.select("c").distinct().count()
    val t = tree.agg(count(lit(1)), sum("w"),
      sum(col("ku") * 1000000L + col("kv"))).head()
    val (nTree, wTot, ck) = (t.getLong(0),
      if (t.isNullAt(1)) 0L else t.getLong(1),
      if (t.isNullAt(2)) 0L else t.getLong(2))
    Seq((nNodes, nComp, nTree, wTot, ck,
      nTree == nNodes - nComp, allContracted, leftover == 0L))
      .toDF("n_nodes", "n_components", "n_tree_edges", "total_weight",
        "edge_checksum", "forest_valid", "fully_contracted",
        "converged")
  }

  /** Frontier-delta Bellman-Ford: each round joins edges only against
    * the FRONTIER (rows whose distance improved last round) and
    * min-merges the relaxed candidates into the settled table — never
    * a full edges⋈dist shuffle per round. Exactness is unchanged vs
    * full relaxation at the same round count: a node whose distance is
    * final relaxes its out-edges the round after it last improved, and
    * relaxing it again with the same value can add nothing, so the
    * k-round horizon (dist = min over ≤k-edge paths) is identical —
    * ScaleOpsSpec's chain-graph horizon cases pin this. Once the
    * frontier drains the remaining rounds are skipped outright, so
    * the converged-flag rounds after hop-diameter cost nothing. */
  private[graft] def ssspRounds(edges: DataFrame, seeds: DataFrame,
      rounds: Int): (DataFrame, DataFrame) = {
    var prev: DataFrame = null
    var dist = seeds.localCheckpoint(true)
    var frontier = dist
    var drained = false
    for (_ <- 1 to rounds) {
      prev = dist
      if (!drained) {
        // candidates from the frontier's out-edges only, min-merged
        // with the settled table in ONE tagged union-agg (no separate
        // full_outer join stage); `old` = the settled value, null for
        // a newly reached node
        val cand = edges
          .join(frontier.withColumnRenamed("v", "src"), Seq("src"))
          .select(col("dst").as("v"),
            (col("dist") + col("w")).as("x"), lit(false).as("settled"))
        val merged = dist
          .select(col("v"), col("dist").as("x"), lit(true).as("settled"))
          .unionByName(cand)
          .groupBy("v")
          .agg(min("x").as("dist"),
            min(when(col("settled"), col("x"))).as("old"))
          .localCheckpoint(true)
        dist = merged.select("v", "dist")
        frontier = merged
          .filter(col("old").isNull || col("dist") < col("old"))
          .select("v", "dist")
        // cheap limit-1 scan of the checkpointed round output: once
        // the frontier drains the fixpoint is reached and the
        // remaining rounds are skipped outright (dist is unchanged
        // from here on, so the (prev, dist) converged-flag contract
        // still holds)
        drained = frontier.isEmpty
      }
    }
    (prev, dist)
  }

  /** q257's multi-source BFS frontier loop — ssspRounds keyed on
    * (v, seed): K landmarks share one fixpoint (state K× nodes, one
    * edge join per round — never one BFS pass per landmark). Split
    * out so ScaleOpsSpec pins distances on a crafted path graph and
    * the K-landmark independence (each seed's column equals its own
    * single-source run). */
  private[graft] def landmarkBfsRounds(edges: DataFrame,
      seeds: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    var prev: DataFrame = null
    var dist = seeds.localCheckpoint(true)
    var frontier = dist
    var drained = false
    for (_ <- 1 to rounds) {
      prev = dist
      if (!drained) {
        val cand = edges
          .join(frontier.withColumnRenamed("v", "src"), Seq("src"))
          .select(col("dst").as("v"), col("seed"),
            (col("dist") + lit(1L)).as("x"), lit(false).as("settled"))
        val merged = dist
          .select(col("v"), col("seed"), col("dist").as("x"),
            lit(true).as("settled"))
          .unionByName(cand)
          .groupBy("v", "seed")
          .agg(min("x").as("dist"),
            min(when(col("settled"), col("x"))).as("old"))
          .localCheckpoint(true)
        dist = merged.select("v", "seed", "dist")
        frontier = merged
          .filter(col("old").isNull || col("dist") < col("old"))
          .select("v", "seed", "dist")
        drained = frontier.isEmpty
      }
    }
    (prev, dist)
  }

  /** λ=1 Poisson inverse-CDF thresholds (cumulative, 10 dp — fixed
    * literals shared verbatim with the DuckDB oracle via
    * [[poissonCaseSql]]). */
  private[graft] val PoissonCdf1 = Seq(
    "0.3678794412", "0.7357588823", "0.9196986029", "0.9810118431",
    "0.9963401532", "0.9994058152", "0.9999167589")

  /** The CASE expression mapping a uniform `u` to a Poisson(1) draw —
    * GENERATED once and evaluated verbatim by BOTH engines, so the
    * inversion cannot drift. */
  private[graft] def poissonCaseSql(u: String): String =
    PoissonCdf1.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 7 END")

  /** q206's Poisson-bootstrap CI over a (doc_id, x) frame: P = 100
    * deterministic replicates, integer (W, S) per replicate, 6-dp
    * means, nearest-rank 2.5%/97.5% under the total (mean, r) order.
    * The O(P) replicate table is collected driver-side — bounded by
    * construction. Split out so ScaleOpsSpec pins the CDF inversion
    * corners and that a constant column yields a zero-width CI. */
  private[graft] def bootstrapCi(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pool = docs.localCheckpoint(true)
    val o = pool.agg(sum("x"), count(lit(1))).head()
    val (sObs, nObs) = (o.getLong(0), o.getLong(1))
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val u = conv(substring(md5(concat_ws(":", col("doc_id"), col("p"))),
      1, 8), 16, 10).cast("double") / lit(4294967296.0)
    val repRows = pool
      .select(col("doc_id"), col("x"),
        explode(lit((0 until 100).toArray)).as("p"))
      .withColumn("u_val", u)
      .withColumn("w", expr(poissonCaseSql("u_val")).cast("long"))
      .groupBy("p").agg(sum("w").as("wsum"),
        sum(col("w") * col("x")).as("ssum"))
      .filter(col("wsum") > 0)
      .collect()
      .map(r => (r.getAs[Int]("p"), r.getAs[Long]("wsum"),
        r.getAs[Long]("ssum")))
    val means = repRows
      .map { case (p, w, sv) => (r6(sv.toDouble / w), p) }
      .sorted
    val nRep = means.length
    val lo = means(math.ceil(0.025 * nRep).toInt - 1)._1
    val hi = means(math.ceil(0.975 * nRep).toInt - 1)._1
    Seq((nObs, r6(sObs.toDouble / nObs), nRep.toLong, lo, hi))
      .toDF("n_docs", "mean_obs", "n_replicates", "ci_lo", "ci_hi")
  }

  /** q205's deterministic permutation test over a (doc_id, source, x)
    * pool with real groups `a`/`b`: P = 100 md5-parity permutations,
    * extremeness decided by exact integer cross-multiplication.
    * Split out so ScaleOpsSpec pins that equality COUNTS as extreme
    * (an all-equal pool reads p ≈ 1) and that a maximal planted
    * difference reads p near 1/101. */
  private[graft] def permTest(poolDf: DataFrame, a: String, b: String)
      : DataFrame = {
    val spark = poolDf.sparkSession
    import spark.implicits._
    val pool = poolDf.localCheckpoint(true)
    val o = pool.agg(
      sum(when(col("source") === a, col("x"))).as("sa"),
      sum(when(col("source") === a, 1L)).as("na"),
      sum(when(col("source") === b, col("x"))).as("sb"),
      sum(when(col("source") === b, 1L)).as("nb")).head()
    val (sa, na, sb, nb) = (o.getLong(0), o.getLong(1),
      o.getLong(2), o.getLong(3))
    val obsNum = math.abs(sa * nb - sb * na)
    val perms = pool
      .select(col("doc_id"), col("x"),
        explode(lit((0 until 100).toArray)).as("p"))
      .withColumn("bit",
        conv(substring(md5(concat_ws(":", col("doc_id"), col("p"))),
          1, 1), 16, 10).cast("long") % 2)
      .groupBy("p").agg(
        sum(when(col("bit") === 0, col("x")).otherwise(0L)).as("s0"),
        sum(when(col("bit") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("bit") === 1, col("x")).otherwise(0L)).as("s1"),
        sum(when(col("bit") === 1, 1L).otherwise(0L)).as("n1"))
    val nExtreme = perms
      .filter(col("n0") > 0 && col("n1") > 0 &&
        abs(col("s0") * col("n1") - col("s1") * col("n0"))
          * lit(na * nb)
          >= lit(obsNum) * col("n0") * col("n1"))
      .count()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((na, nb, r6(sa.toDouble / na), r6(sb.toDouble / nb),
      obsNum, nExtreme, r6((nExtreme + 1).toDouble / 101)))
      .toDF("n_a", "n_b", "mean_a", "mean_b", "obs_scaled",
        "n_extreme", "p_value")
  }

  /** q204's per-candidate FD check: does lhs → rhs hold in df? One
    * aggregate over the LHS; a group violates when it sees more than
    * one distinct RHS value. Split out so ScaleOpsSpec pins the
    * corners (a key, a violated dependency, NULL-as-value). */
  private[graft] def fdAudit(df: DataFrame, name: String,
      lhs: Seq[String], rhs: String): DataFrame = {
    df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("nrhs"), count(lit(1)).as("nrows"))
      .agg(count(lit(1)).as("n_lhs"),
        sum(when(col("nrhs") > 1, 1L).otherwise(0L))
          .as("violating_lhs"),
        sum(when(col("nrhs") > 1, col("nrows")).otherwise(0L))
          .as("violating_rows"))
      .select(lit(name).as("fd"), col("n_lhs"), col("violating_lhs"),
        col("violating_rows"),
        (col("violating_lhs") === 0L).as("holds"))
  }

  /** q201's butterfly census over a bipartite (o, p) incidence table:
    * wedges (p1 < p2 sharing an order) → per-pair co-degree m →
    * butterflies = Σ C(m, 2). Split out so ScaleOpsSpec pins the
    * K_{a,b} closed forms (C(a,2)·C(b,2) butterflies). */
  private[graft] def butterflyStats(op: DataFrame): DataFrame = {
    val w = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("p1"), col("b.p").as("p2"))
    w.groupBy("p1", "p2").agg(count(lit(1)).as("m"))
      .agg(count(lit(1)).as("wedge_pairs"), sum("m").as("wedges"),
        sum(expr("(m * (m - 1)) div 2")).as("butterflies"),
        max("m").as("max_codeg"))
  }

  /** q200's deferred-normalization HITS over a bipartite (c, sp) edge
    * table: h0 = 1, then a_r = Iᵀh_{r-1}, h_r = I·a_r for `rounds`
    * rounds — every score an exact BIGINT alternating-path count.
    * Returns (authority, hub) score tables. Split out so ScaleOpsSpec
    * pins the recurrence on a hand-walked 2×2 graph. */
  private[graft] def hitsScores(e: DataFrame, rounds: Int,
      broadcastScores: Boolean = true): (DataFrame, DataFrame) = {
    // the score tables are NODE-sized (they grow with the graph), so
    // the broadcast is a runtime choice like lpaRound's, not a
    // mandatory hint: callers gate on a bounded count (q200 uses the
    // checkpointed edge count) and the `false` path shuffle-joins on
    // the node key — identical exact BIGINT scores either way
    def bc(df: DataFrame): DataFrame =
      if (broadcastScores) broadcast(df) else df
    var a = e.groupBy("sp").agg(count(lit(1)).as("score"))
    var h = e.join(bc(a), "sp")
      .groupBy("c").agg(sum("score").as("score"))
    for (_ <- 2 to rounds) {
      a = e.join(bc(h), "c")
        .groupBy("sp").agg(sum("score").as("score"))
      h = e.join(bc(a), "sp")
        .groupBy("c").agg(sum("score").as("score"))
    }
    (a, h)
  }

  /** q198's wedge scorer over an UNDIRECTED (u < v) edge table: every
    * non-adjacent pair with ≥ 1 common neighbor, its common-neighbor
    * count and Resource-Allocation score Σ_w round(1/deg(w), 9) as an
    * exact DECIMAL sum cast once to double. Split out so ScaleOpsSpec
    * pins the algebra: a path's endpoints read (cn 1, ra 1/2), a
    * 4-cycle's diagonals (cn 2, ra 1), a triangle predicts nothing. */
  private[graft] def linkPredict(und: DataFrame): DataFrame = {
    val e = und.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(und.select(col("v").as("src"), col("u").as("dst")))
    val deg = e.groupBy(col("src").as("w")).agg(count(lit(1)).as("d"))
    val wedges = e.as("x").join(e.as("y"), Seq("src"))
      .filter(col("x.dst") < col("y.dst"))
      .select(col("src").as("w"), col("x.dst").as("u"),
        col("y.dst").as("v"))
    // deg is vertex-sized (GROWS): counted broadcast gate, same idiom
    // as triangleStats/pageRankFixedPoint — the wedge side is already
    // keyed by w, so the shuffle-join fallback co-partitions cleanly
    val degBc =
      if (deg.count() <= broadcastRowLimit(16)) broadcast(deg) else deg
    wedges.join(degBc, "w")
      .withColumn("term",
        round(lit(1.0) / col("d"), 9).cast("decimal(18,9)"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("cn"), sum("term").as("rasum"))
      .join(und, Seq("u", "v"), "left_anti")
      .select(col("u"), col("v"), col("cn"),
        col("rasum").cast("double").as("ra"))
  }

  /** q191's exact average precision over a (score: double, k: long,
    * p: 0/1 long) frame, under the deterministic total order
    * (score desc, k asc): AP = mean over positives of precision at
    * that positive's rank. The global ranking never materializes —
    * the range-partitioned DistributedPrefix scan carries (rows, pos)
    * cumulative counts; each positive emits round(precision, 9) as an
    * exact 9-dp decimal, summed exactly, one double division at the
    * end. Split out so ScaleOpsSpec pins the closures (perfect → 1,
    * single positive ranked last → 1/n, hand-checked mixed case). */
  private[graft] def averagePrecision(scored: DataFrame): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = scored
      .repartitionByRange(parts, col("score").desc, col("k").asc)
      .sortWithinPartitions(col("score").desc, col("k").asc)
      .as[(Double, Long, Long)]
    val terms = DistributedPrefix.scan(ranged, (0L, 0L),
      (a: (Long, Long), r: (Double, Long, Long)) =>
        (a._1 + 1, a._2 + r._3),
      (x: (Long, Long), y: (Long, Long)) =>
        (x._1 + y._1, x._2 + y._2)) {
      case ((rb, pb), (_, _, p)) =>
        if (p == 1L)
          BigDecimal((pb + 1).toDouble / (rb + 1))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        else BigDecimal(0)
    }
    val sumPrec = terms.reduce(_ + _) // exact 9-dp decimal sum
    val nP = scored.agg(sum("p")).head().getLong(0)
    // both engines: exact decimal -> nearest double, ONE double
    // division, round 9 — bit-identical by construction
    val ap = BigDecimal(sumPrec.toDouble / nP)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq((nP, sumPrec.toDouble, ap)).toDF("n_pos", "sum_prec", "ap")
  }

  /** Morton (z-order) value of two 12-bit keys: classic mask-shift bit
    * spread, expressed in Column arithmetic so it stays inside
    * whole-stage codegen and is reproducible bit-for-bit in DuckDB. */
  private[graft] def zval(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  val oracles: Map[String, String] = Map(
    "q148_k_anonymity" ->
      """WITH q AS (
        |  SELECT c_nationkey AS nat, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS bal_band
        |  FROM customer),
        |c AS (
        |  SELECT nat, seg, bal_band, count(*) AS k FROM q GROUP BY 1, 2, 3)
        |SELECT min(k) AS k_min, count(*) AS n_classes,
        |  CAST(sum(k) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_lt5,
        |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk
        |FROM c""".stripMargin,
    "q82_hll_sketch" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  true AS hll_ok, true AS q_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "q114_hll_rollup" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  true AS rollup_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "q92_cms_heavy_hitters" ->
      """WITH tk AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        |  FROM documents
        |)
        |SELECT t, count(*) AS exact, true AS cms_ok
        |FROM tk GROUP BY t
        |ORDER BY exact DESC, t ASC LIMIT 20""".stripMargin,
    "q83_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q144_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q84_date_partition_prune" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |FROM events
        |WHERE ts::DATE = (SELECT min(ts)::DATE + 1 FROM events)
        |GROUP BY event_type""".stripMargin,
    "q85_bloom_semi_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        |GROUP BY l_returnflag""".stripMargin,
    "q97_compact" ->
      """SELECT count(*) AS rows, sum(l_orderkey)::BIGINT AS key_sum,
        |  true AS files_collapsed
        |FROM lineitem""".stripMargin,
    // same deterministic change-batch derivation, merged the plain-SQL
    // way — equal reports prove the anti-join+union MERGE exact
    "q140_merge_upsert" ->
      """WITH base AS (SELECT doc_id, n_chars, source FROM documents),
        |upd AS (
        |  SELECT doc_id, n_chars + 1 AS n_chars, source FROM base
        |  WHERE doc_id % 7 = 0 AND doc_id % 13 <> 0),
        |ins AS (
        |  SELECT doc_id + 2000000 AS doc_id, n_chars, source FROM base
        |  WHERE doc_id % 10 = 0),
        |keep AS (
        |  SELECT * FROM base
        |  WHERE NOT (doc_id % 7 = 0 OR doc_id % 13 = 0)),
        |m AS (
        |  SELECT * FROM keep UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins)
        |SELECT source, count(*) AS n_docs,
        |  sum(n_chars)::BIGINT AS chars_total,
        |  bit_xor(doc_id)::BIGINT AS id_xor
        |FROM m GROUP BY source""".stripMargin,
    // v1 = the table; v2 = table plus the id-offset appended subset —
    // recomputed from source, independent of the engine's manifests
    "q139_snapshot_read" ->
      """WITH v1 AS (SELECT doc_id, n_chars FROM documents),
        |v2 AS (SELECT doc_id, n_chars FROM v1
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, n_chars FROM documents
        |  WHERE doc_id % 10 = 0)
        |SELECT 1 AS version, count(*) AS n_docs,
        |  sum(n_chars)::BIGINT AS chars_total,
        |  bit_xor(doc_id)::BIGINT AS id_xor
        |FROM v1
        |UNION ALL
        |SELECT 2, count(*), sum(n_chars)::BIGINT,
        |  bit_xor(doc_id)::BIGINT
        |FROM v2""".stripMargin,
    "q95_pivot" ->
      """SELECT source,
        |  count(*) FILTER (WHERE lang = 'en') AS en,
        |  count(*) FILTER (WHERE lang = 'de') AS de,
        |  count(*) FILTER (WHERE lang = 'es') AS es,
        |  count(*) FILTER (WHERE lang = 'fr') AS fr,
        |  count(*) FILTER (WHERE lang = 'zh') AS zh
        |FROM documents GROUP BY source""".stripMargin,
    "q96_setops" ->
      """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
        |b AS (SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'),
        |i AS (SELECT l_orderkey FROM a INTERSECT SELECT l_orderkey FROM b),
        |x AS (SELECT l_orderkey FROM a EXCEPT SELECT l_orderkey FROM b)
        |SELECT (SELECT count(*) FROM i) AS inter_n,
        |  (SELECT min(l_orderkey) FROM i) AS inter_min,
        |  (SELECT max(l_orderkey) FROM i) AS inter_max,
        |  (SELECT count(*) FROM x) AS except_n""".stripMargin,
    "q101_user_timeline" ->
      """WITH e AS (
        |  SELECT user_id,
        |    lpad(epoch_us(ts)::VARCHAR, 20, '0') || ':'
        |      || lpad(event_id::VARCHAR, 10, '0') || ':'
        |      || event_type AS el
        |  FROM events
        |)
        |SELECT user_id, count(*) AS n_events,
        |  md5(string_agg(el, '|' ORDER BY el)) AS timeline_fp
        |FROM e GROUP BY user_id""".stripMargin,
    "q108_merge_rollup" ->
      """SELECT source, count(*) AS docs, sum(n_chars)::BIGINT AS chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  round(sum(n_chars)::DOUBLE / count(*), 6) AS avg_chars
        |FROM documents GROUP BY source""".stripMargin,
    "q109_user_features" ->
      """SELECT user_id, event_id,
        |  row_number() OVER w AS seq,
        |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w5 AS DOUBLE)
        |    / count(*) OVER w5, 6) AS roll_avg_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  w5 AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q110_pagerank" ->
      """WITH eo AS (
        |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), e AS (
        |  SELECT a AS src, b AS dst FROM eo
        |  UNION ALL SELECT b, a FROM eo
        |), deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT src AS node, 10000000000::BIGINT AS r_fp FROM deg),
        |i1 AS (
        |  SELECT e.dst AS node,
        |    (1500000000 + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst
        |), i2 AS (
        |  SELECT e.dst AS node,
        |    (1500000000 + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN i1 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst
        |), i3 AS (
        |  SELECT e.dst AS node,
        |    (1500000000 + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN i2 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst
        |), i4 AS (
        |  SELECT e.dst AS node,
        |    (1500000000 + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN i3 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst
        |), i5 AS (
        |  SELECT e.dst AS node,
        |    (1500000000 + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN i4 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst
        |)
        |SELECT node, r_fp, r_fp::DOUBLE / 1e10 AS rank FROM i5
        |ORDER BY r_fp DESC, node ASC LIMIT 20""".stripMargin,

    // q301: same day arithmetic, same split labels, same censuses
    "q301_purged_split" ->
      """WITH e AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id FROM events
        |), t AS (
        |  SELECT day, user_id,
        |    CASE WHEN day >= (SELECT max(day) FROM e) - 6
        |        THEN '3_test'
        |      WHEN day >= (SELECT max(day) FROM e) - 8
        |        THEN '2_embargo'
        |      ELSE '1_train' END AS split
        |  FROM e
        |)
        |SELECT split, count(*)::BIGINT AS rows,
        |  count(DISTINCT day)::BIGINT AS days,
        |  min(day) AS min_day, max(day) AS max_day,
        |  count(DISTINCT user_id)::BIGINT AS users
        |FROM t GROUP BY split
        |UNION ALL
        |SELECT '4_user_overlap', count(*)::BIGINT, 0::BIGINT,
        |  DATE '1970-01-01', DATE '1970-01-01', count(*)::BIGINT
        |FROM (
        |  SELECT DISTINCT user_id FROM t WHERE split = '1_train'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM t WHERE split = '3_test'
        |)
        |ORDER BY split""".stripMargin,

    // q298: same interval join, same per-purchase counts, same
    // floor-division + last-touch-remainder rule
    "q298_multitouch" ->
      """WITH v AS (
        |  SELECT user_id, ts AS v_ts, event_id AS v_eid FROM events
        |  WHERE event_type = 'view'
        |), p AS (
        |  SELECT user_id AS p_uid, ts AS p_ts, event_id AS p_eid
        |  FROM events WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT v.user_id, p.p_eid, v.v_eid, v.v_ts,
        |    count(*) OVER (PARTITION BY p.p_eid) AS k,
        |    row_number() OVER (PARTITION BY p.p_eid
        |      ORDER BY v.v_ts DESC, v.v_eid DESC) AS touch_rank
        |  FROM v JOIN p ON v.user_id = p.p_uid
        |    AND v.v_ts <= p.p_ts
        |    AND v.v_ts >= p.p_ts - INTERVAL 30 MINUTE
        |)
        |SELECT user_id, p_eid, v_eid, k,
        |  CASE WHEN touch_rank = 1
        |    THEN 1000000 - (k - 1) * (1000000 // k)
        |    ELSE 1000000 // k END AS credit_fp
        |FROM j ORDER BY p_eid, v_eid""".stripMargin,

    // q297: the DATA recomputes what the FOOTER claims — a stats/
    // data divergence is a silent pruning corruption
    "q297_footer_stats" ->
      """SELECT 'doc_id' AS column_name, 1 AS row_groups,
        |  count(*)::BIGINT AS n_rows, 0::BIGINT AS null_count,
        |  min(doc_id)::BIGINT AS stat_min,
        |  max(doc_id)::BIGINT AS stat_max
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', 1, count(*)::BIGINT, 0::BIGINT,
        |  min(n_chars)::BIGINT, max(n_chars)::BIGINT
        |FROM documents
        |ORDER BY column_name""".stripMargin,

    // q292: the oracle is the UNSALTED join — salting must be
    // invisible in the result set
    "q292_salted_join" ->
      """SELECT n_name, count(*)::BIGINT AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_price
        |FROM (
        |  SELECT CASE WHEN o_orderkey % 10 < 7 THEN 0
        |    ELSE o_orderkey % 25 END AS k, o_totalprice
        |  FROM orders
        |) f JOIN nation ON f.k = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    // q286: q110's recurrence with a seed-concentrated restart; the
    // seed share and restart term are the same floor divisions the
    // Spark side computes (1e10 div |S|, (15·share) div 100).
    // MATERIALIZED: e/deg/sd are referenced by every unrolled round.
    "q286_ppr" ->
      """WITH eo AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), e AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM eo
        |  UNION ALL SELECT b, a FROM eo
        |), deg AS MATERIALIZED (
        |  SELECT src, count(*) AS deg FROM e GROUP BY src
        |), sd AS MATERIALIZED (
        |  SELECT DISTINCT 'c' || o_custkey AS node FROM orders
        |  WHERE o_custkey % 100 = 0
        |), cfg AS MATERIALIZED (
        |  SELECT (10000000000 // count(*))::BIGINT AS share,
        |    ((15 * (10000000000 // count(*))) // 100)::BIGINT AS rst
        |  FROM sd
        |), r0 AS (
        |  SELECT d.src AS node,
        |    (CASE WHEN sd.node IS NOT NULL THEN (SELECT share FROM cfg)
        |      ELSE 0 END)::BIGINT AS r_fp
        |  FROM deg d LEFT JOIN sd ON d.src = sd.node
        |), i1 AS (
        |  SELECT e.dst AS node,
        |    (CASE WHEN max(sd.node) IS NOT NULL THEN (SELECT rst FROM cfg)
        |       ELSE 0 END
        |     + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  LEFT JOIN sd ON e.dst = sd.node
        |  GROUP BY e.dst
        |), i2 AS (
        |  SELECT e.dst AS node,
        |    (CASE WHEN max(sd.node) IS NOT NULL THEN (SELECT rst FROM cfg)
        |       ELSE 0 END
        |     + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN i1 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  LEFT JOIN sd ON e.dst = sd.node
        |  GROUP BY e.dst
        |), i3 AS (
        |  SELECT e.dst AS node,
        |    (CASE WHEN max(sd.node) IS NOT NULL THEN (SELECT rst FROM cfg)
        |       ELSE 0 END
        |     + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN i2 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  LEFT JOIN sd ON e.dst = sd.node
        |  GROUP BY e.dst
        |), i4 AS (
        |  SELECT e.dst AS node,
        |    (CASE WHEN max(sd.node) IS NOT NULL THEN (SELECT rst FROM cfg)
        |       ELSE 0 END
        |     + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN i3 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  LEFT JOIN sd ON e.dst = sd.node
        |  GROUP BY e.dst
        |), i5 AS (
        |  SELECT e.dst AS node,
        |    (CASE WHEN max(sd.node) IS NOT NULL THEN (SELECT rst FROM cfg)
        |       ELSE 0 END
        |     + (85 * sum(r.r_fp // d.deg)) // 100)::BIGINT AS r_fp
        |  FROM e JOIN i4 r ON e.src = r.node JOIN deg d ON e.src = d.src
        |  LEFT JOIN sd ON e.dst = sd.node
        |  GROUP BY e.dst
        |)
        |SELECT node, node IN (SELECT node FROM sd) AS is_seed, r_fp,
        |  r_fp::DOUBLE / 1e10 AS rank
        |FROM i5 ORDER BY r_fp DESC, node ASC LIMIT 20""".stripMargin,
    "q113_source_roundtrip" ->
      """WITH s AS (
        |  SELECT count(*) AS rows,
        |    -- COALESCE to the same sentinel the Spark side uses: ||
        |    -- nulls the whole input where concat_ws would skip the field
        |    sum(('0x' || md5(COALESCE(event_id::VARCHAR, chr(1)) || '|'
        |      || COALESCE(user_id::VARCHAR, chr(1)) || '|'
        |      || COALESCE(event_type, chr(1)))[1:15])::BIGINT
        |      % 1000000007)::BIGINT AS id_checksum,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
        |    sum(COALESCE(length(props), 0))::BIGINT AS props_bytes
        |  FROM events
        |)
        |SELECT rows, id_checksum, value_sum, props_bytes, 'csv' AS fmt FROM s
        |UNION ALL
        |SELECT rows, id_checksum, value_sum, props_bytes, 'json' AS fmt FROM s""".stripMargin,
    // q266: DuckDB has no ORC reader, so the oracle summarizes the
    // parquet ORIGINAL — any row/instant the ORC round-trip loses or
    // shifts diverges a checksum
    "q266_orc_roundtrip" ->
      """SELECT count(*) AS rows,
        |  sum(('0x' || md5(COALESCE(event_id::VARCHAR, chr(1)) || '|'
        |    || COALESCE(user_id::VARCHAR, chr(1)) || '|'
        |    || COALESCE(event_type, chr(1)))[1:15])::BIGINT
        |    % 1000000007)::BIGINT AS id_checksum,
        |  sum(epoch_us(ts) % 1000000007)::BIGINT AS ts_checksum,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
        |  sum(COALESCE(length(props), 0))::BIGINT AS props_bytes,
        |  'orc' AS fmt
        |FROM events""".stripMargin,
    "q111_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |  GROUP BY e.user_id
        |)
        |SELECT (SELECT count(*) FROM v) AS users_viewed,
        |  (SELECT count(*) FROM c) AS users_clicked,
        |  (SELECT count(*) FROM p) AS users_purchased""".stripMargin,
    "q112_retention" ->
      """WITH f AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_d
        |  FROM events GROUP BY user_id
        |)
        |SELECT CAST(f.cohort_d AS VARCHAR) AS cohort,
        |  date_diff('day', f.cohort_d, CAST(e.ts AS DATE)) AS day_offset,
        |  count(DISTINCT e.user_id) AS users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q87_stream_interval_join" ->
      """SELECT v.user_id, count(*) AS pairs,
        |  count(DISTINCT p.ts) AS purchases_attributed
        |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
        |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
        |GROUP BY v.user_id""".stripMargin,
    // Simple a<b<c id-order triangle join — the Spark side counts the
    // same triangles via degree orientation; equal totals prove the
    // orientation exact.
    "q125_triangle_count" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), e AS (
        |  SELECT DISTINCT a.p AS u, b.p AS v
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |), deg AS (
        |  SELECT n, count(*) AS deg FROM (
        |    SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
        |  GROUP BY n
        |), tri AS (
        |  SELECT count(*) AS t
        |  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
        |       JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        |), w AS (
        |  SELECT CAST(sum(deg * (deg - 1)) AS BIGINT) // 2 AS w2 FROM deg
        |)
        |SELECT
        |  (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
        |  (SELECT count(*) FROM e)::BIGINT AS n_edges,
        |  (SELECT t FROM tri)::BIGINT AS n_triangles,
        |  round(3.0 * (SELECT t FROM tri) / (SELECT w2 FROM w), 6) AS gcc""".stripMargin,
    "q128_event_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS b
        |  FROM events
        |), c AS (
        |  SELECT a, b, count(*) AS n FROM p WHERE b IS NOT NULL GROUP BY a, b
        |), tot AS (
        |  SELECT a, CAST(sum(n) AS BIGINT) AS na FROM c GROUP BY a
        |)
        |SELECT a, b, n, round(n::DOUBLE / na, 6) AS p
        |FROM c JOIN tot USING (a)""".stripMargin,
    "q129_zorder_tiles" ->
      """WITH b AS (
        |  SELECT l_partkey % 4096 AS x, l_orderkey % 4096 AS y
        |  FROM lineitem
        |), s AS (
        |  SELECT x, y,
        |    ((x | (x << 8)) & 16711935) AS x1, ((y | (y << 8)) & 16711935) AS y1
        |  FROM b
        |), s2 AS (
        |  SELECT x, y,
        |    ((x1 | (x1 << 4)) & 252645135) AS x2,
        |    ((y1 | (y1 << 4)) & 252645135) AS y2
        |  FROM s
        |), s3 AS (
        |  SELECT x, y,
        |    ((x2 | (x2 << 2)) & 858993459) AS x3,
        |    ((y2 | (y2 << 2)) & 858993459) AS y3
        |  FROM s2
        |), z AS (
        |  SELECT x, y,
        |    (((x3 | (x3 << 1)) & 1431655765)
        |      | (((y3 | (y3 << 1)) & 1431655765) << 1)) AS zval
        |  FROM s3
        |)
        |SELECT zval >> 16 AS tile, count(*) AS n,
        |  min(x) AS min_x, max(x) AS max_x,
        |  min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1""".stripMargin,
    "q134_basket_pairs" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), c AS (
        |  SELECT a.p AS a, b.p AS b, count(*) AS n
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2
        |), pc AS (
        |  SELECT p, count(*) AS np FROM li GROUP BY 1
        |), no AS (
        |  SELECT count(DISTINCT o) AS n_orders FROM li
        |)
        |SELECT c.a, c.b, c.n,
        |  round(c.n::DOUBLE * (SELECT n_orders FROM no)
        |    / (na.np * nb.np), 6) AS lift
        |FROM c JOIN pc na ON na.p = c.a JOIN pc nb ON nb.p = c.b
        |WHERE c.n >= 3""".stripMargin,
    // independent algorithm on the oracle side: direct NOT EXISTS
    // dominance test, no sweep
    "q135_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice
        |      OR q.p_size > p.p_size))""".stripMargin,
    "q150_sessionize_batch" -> s"""$sessionSql
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(sum(n_events) AS BIGINT) AS n_events,
        |  max(n_events) AS max_session_events,
        |  CAST(sum(b_us - a_us) AS BIGINT) AS total_session_us,
        |  round(sum(n_events)::DOUBLE / count(*), 6)
        |    AS avg_session_events
        |FROM sess GROUP BY user_id""".stripMargin,
    "q152_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    json_extract_string(props, '$.k')::BIGINT AS k
        |  FROM events
        |)
        |SELECT event_type, count(*) AS n, count(k) AS n_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k,
        |  count(DISTINCT k) AS distinct_k,
        |  round(sum(k)::DOUBLE / count(k), 6) AS avg_k
        |FROM e GROUP BY event_type""".stripMargin,
    "q153_scd2_history" ->
      """WITH s AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type AS state,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), v AS (
        |  SELECT user_id, event_id, us, state FROM s
        |  WHERE prev IS NULL OR prev <> state
        |)
        |SELECT user_id, state, us AS valid_from_us,
        |  lead(us) OVER w AS valid_to_us,
        |  lead(us) OVER w IS NULL AS is_current
        |FROM v WINDOW w AS
        |  (PARTITION BY user_id ORDER BY us, event_id)""".stripMargin,
    "q154_peak_concurrency" -> s"""$sessionSql
        |, d AS (
        |  SELECT a_us AS t, 1 AS dlt FROM sess
        |  UNION ALL SELECT b_us, -1 FROM sess
        |), r AS (
        |  SELECT t, sum(dlt) OVER
        |    (ORDER BY t, dlt DESC ROWS UNBOUNDED PRECEDING) AS run
        |  FROM d
        |), ns AS (SELECT count(*) AS n_sessions FROM sess)
        |SELECT CAST(run AS BIGINT) AS peak_concurrency, t AS at_us,
        |  n_sessions
        |FROM r, ns ORDER BY run DESC, t LIMIT 1""".stripMargin,
    "q157_lpa_communities" -> ("""WITH eo AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS a,
        |    CAST(l_suppkey AS BIGINT) * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), e AS (
        |  SELECT a AS src, b AS dst FROM eo
        |  UNION ALL SELECT b, a FROM eo
        |), l0 AS (
        |  SELECT DISTINCT src AS v, src AS lbl FROM e
        |)""".stripMargin
      + (1 to 3).map(r => s"""
, c$r AS (
  SELECT e.dst, l.lbl, count(*) AS cnt
  FROM e JOIN l${r - 1} l ON e.src = l.v GROUP BY 1, 2
), l$r AS (
  SELECT dst AS v, lbl FROM c$r
  QUALIFY row_number() OVER
    (PARTITION BY dst ORDER BY cnt DESC, lbl) = 1
)""").mkString
      + """
SELECT lbl AS community, count(*) AS n_members
FROM l3 GROUP BY 1 ORDER BY n_members DESC, community LIMIT 20"""),
    "q158_l_diversity" ->
      """WITH q AS (
        |  SELECT c_nationkey AS nat,
        |    CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS bal_band,
        |    c_mktsegment AS seg
        |  FROM customer
        |), c AS (
        |  SELECT nat, bal_band, count(*) AS k,
        |    count(DISTINCT seg) AS l
        |  FROM q GROUP BY 1, 2
        |)
        |SELECT min(l) AS l_min, count(*) AS n_classes,
        |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_lt3,
        |  CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk
        |FROM c""".stripMargin,
    // same exact integer tnum per class (zero cells via the class x
    // sensitive grid), one double division, integer threshold compare
    "q195_t_closeness" ->
      """WITH q AS (
        |  SELECT c_nationkey AS nat,
        |    CAST(floor(c_acctbal / 1000.0) * 1000 AS BIGINT) AS bal_band,
        |    c_mktsegment AS seg
        |  FROM customer
        |), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |cls AS (
        |  SELECT nat, bal_band, seg, CAST(count(*) AS BIGINT) AS cnt
        |  FROM q GROUP BY 1, 2, 3
        |), kt AS (
        |  SELECT nat, bal_band, CAST(sum(cnt) AS BIGINT) AS k
        |  FROM cls GROUP BY 1, 2
        |), gt AS (
        |  SELECT seg, CAST(count(*) AS BIGINT) AS g FROM q GROUP BY 1
        |), grid AS (
        |  SELECT kt.nat, kt.bal_band, kt.k, gt.g, n.n,
        |    COALESCE(cls.cnt, 0) AS cnt
        |  FROM kt CROSS JOIN gt
        |  LEFT JOIN cls ON cls.nat = kt.nat
        |    AND cls.bal_band = kt.bal_band AND cls.seg = gt.seg, n
        |), per AS (
        |  SELECT nat, bal_band, max(k) AS k, max(n) AS n,
        |    CAST(sum(abs(cnt * n - k * g)) AS BIGINT) AS tnum
        |  FROM grid GROUP BY 1, 2
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(k) AS BIGINT) AS n_rows,
        |  max(round(tnum::DOUBLE / (2.0 * k * n), 6)) AS t_max,
        |  CAST(sum(CASE WHEN tnum * 10 > 6 * k * n THEN 1 ELSE 0 END)
        |    AS BIGINT) AS classes_gt03,
        |  CAST(sum(CASE WHEN tnum * 10 > 6 * k * n THEN k ELSE 0 END)
        |    AS BIGINT) AS rows_at_risk
        |FROM per""".stripMargin,
    // same peel unrolled: 8 generated CTE rounds per k (the fixture
    // graphs fix in <= 3); rounds = first round whose survivor count
    // matches its predecessor (sets only shrink), id_sum = membership
    // checksum
    "q197_kcore" -> {
      val ks = Seq(8, 20, 40)
      val nr = 8
      def prevOf(k: Int, r: Int) = if (r == 1) "s0" else s"k${k}_s${r - 1}"
      // AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs
      // per reference, and 8 unrolled rounds × 3 k values reference
      // `e` ~50 times — each re-opening the parquet (ulimit blowup)
      val chains = ks.flatMap(k => (1 to nr).map(r => s""",
k${k}_s$r AS MATERIALIZED (
  SELECT e.src AS v FROM e
  JOIN ${prevOf(k, r)} a ON e.src = a.v
  JOIN ${prevOf(k, r)} b ON e.dst = b.v
  GROUP BY e.src HAVING count(*) >= $k
)""")).mkString
      val bodies = ks.map { k =>
        val roundCase = (1 to nr).map(r =>
          s"WHEN (SELECT count(*) FROM k${k}_s$r) = " +
            s"(SELECT count(*) FROM ${prevOf(k, r)}) THEN $r").mkString(" ")
        s"""SELECT $k AS k,
  (SELECT count(*) FROM k${k}_s$nr) AS n_core,
  (SELECT count(*) // 2 FROM e
     JOIN k${k}_s$nr a ON e.src = a.v
     JOIN k${k}_s$nr b ON e.dst = b.v) AS n_core_edges,
  CAST(COALESCE((SELECT sum(v) FROM k${k}_s$nr), 0) AS BIGINT)
    AS id_sum,
  (CASE $roundCase END) AS rounds"""
      }.mkString("\nUNION ALL\n")
      s"""WITH eo AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS a,
    CAST(l_suppkey AS BIGINT) * 2 + 1 AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), e AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM eo UNION ALL SELECT b, a FROM eo
), s0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM e)$chains
$bodies
ORDER BY k"""
    },
    // same wedge enumeration + 9-dp DECIMAL-summed 1/deg terms; anti
    // join drops existing edges; total (ra desc, u, v) order
    "q198_link_predict" ->
      """WITH sq AS MATERIALIZED (
        |  SELECT l_orderkey AS o, l_linenumber AS ln, l_partkey AS p
        |  FROM lineitem
        |), und AS MATERIALIZED (
        |  SELECT DISTINCT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
        |  FROM sq a JOIN sq b
        |    ON a.o = b.o AND b.ln = a.ln + 1 AND a.p <> b.p
        |), e AS MATERIALIZED (
        |  SELECT u AS src, v AS dst FROM und
        |  UNION ALL SELECT v, u FROM und
        |), deg AS MATERIALIZED (
        |  SELECT src AS w, count(*) AS d FROM e GROUP BY 1
        |), wedge AS (
        |  SELECT x.src AS w, x.dst AS u, y.dst AS v
        |  FROM e x JOIN e y ON x.src = y.src AND x.dst < y.dst
        |), sc AS (
        |  SELECT u, v, count(*) AS cn,
        |    sum(CAST(round(1.0 / d, 9) AS DECIMAL(18,9))) AS rasum
        |  FROM wedge JOIN deg USING (w) GROUP BY 1, 2
        |)
        |SELECT u, v, cn, CAST(rasum AS DOUBLE) AS ra
        |FROM sc ANTI JOIN und USING (u, v)
        |ORDER BY ra DESC, u, v LIMIT 20""".stripMargin,
    // same deferred-normalization recurrence: every score an exact
    // BIGINT alternating-path count after 3 rounds
    "q200_hits" ->
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
        |    CAST(l_suppkey AS BIGINT) AS sp
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), a1 AS MATERIALIZED (
        |  SELECT sp, CAST(count(*) AS BIGINT) AS score FROM e GROUP BY 1
        |), h1 AS MATERIALIZED (
        |  SELECT c, CAST(sum(score) AS BIGINT) AS score
        |  FROM e JOIN a1 USING (sp) GROUP BY 1
        |), a2 AS MATERIALIZED (
        |  SELECT sp, CAST(sum(score) AS BIGINT) AS score
        |  FROM e JOIN h1 USING (c) GROUP BY 1
        |), h2 AS MATERIALIZED (
        |  SELECT c, CAST(sum(score) AS BIGINT) AS score
        |  FROM e JOIN a2 USING (sp) GROUP BY 1
        |), a3 AS MATERIALIZED (
        |  SELECT sp, CAST(sum(score) AS BIGINT) AS score
        |  FROM e JOIN h2 USING (c) GROUP BY 1
        |), h3 AS MATERIALIZED (
        |  SELECT c, CAST(sum(score) AS BIGINT) AS score
        |  FROM e JOIN a3 USING (sp) GROUP BY 1
        |)
        |(SELECT 'auth' AS role, sp AS id, score FROM a3
        | ORDER BY score DESC, id LIMIT 10)
        |UNION ALL
        |(SELECT 'hub' AS role, c AS id, score FROM h3
        | ORDER BY score DESC, id LIMIT 10)""".stripMargin,
    // same min-relaxation unrolled: 6 MATERIALIZED rounds, converged
    // = round 6 added/improved nothing over round 5
    // the same unrolled Borůvka algebra: per round a min-edge
    // selection under the (w, ku, kv) total order, 2-cycle break
    // rooting the smaller id, 6 pointer-doubling steps; the full
    // R×J budget is unrolled — once converged every further CTE is
    // an identity, exactly like the Spark loop's early exit
    "q223_boruvka_msf" -> {
      val (rounds, jumps) = (5, 6)
      def prevC(r: Int) = if (r == 1) "c0" else s"c${r - 1}"
      val roundSql = (1 to rounds).map { r =>
        val jumpChain = (1 to jumps).map { j =>
          val prev = if (j == 1) s"pb_$r" else s"pj_${r}_${j - 1}"
          s""",
pj_${r}_$j AS MATERIALIZED (
  SELECT a.c, b.t FROM $prev a JOIN $prev b ON a.t = b.c
)"""
        }.mkString
        s""",
sel_$r AS MATERIALIZED (
  SELECT cs AS c, cd AS t, w, ku, kv FROM (
    SELECT a.c AS cs, b.c AS cd, e2.w, e2.ku, e2.kv,
      row_number() OVER (PARTITION BY a.c
        ORDER BY e2.w, e2.ku, e2.kv) AS rn
    FROM e2 JOIN ${prevC(r)} a ON e2.x = a.v
    JOIN ${prevC(r)} b ON e2.y = b.v
    WHERE a.c <> b.c) WHERE rn = 1
),
p0_$r AS MATERIALIZED (
  SELECT cm.c, coalesce(s.t, cm.c) AS t
  FROM (SELECT DISTINCT c FROM ${prevC(r)}) cm
  LEFT JOIN sel_$r s ON cm.c = s.c
),
pb_$r AS MATERIALIZED (
  SELECT a.c,
    CASE WHEN b.t = a.c AND a.c < a.t THEN a.c ELSE a.t END AS t
  FROM p0_$r a JOIN p0_$r b ON a.t = b.c
)$jumpChain,
c$r AS MATERIALIZED (
  SELECT cp.v, pj.t AS c
  FROM ${prevC(r)} cp JOIN pj_${r}_$jumps pj ON cp.c = pj.c
)"""
      }.mkString
      val unsSum = (1 to rounds).map(r =>
        s"(SELECT count(*) FROM pj_${r}_$jumps a " +
          s"JOIN pj_${r}_$jumps b ON a.t = b.c WHERE b.t <> a.t)")
        .mkString(" + ")
      val treeUnion = (1 to rounds)
        .map(r => s"SELECT ku, kv, w FROM sel_$r")
        .mkString(" UNION ALL ")
      s"""WITH we AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) * 2 AS u,
    CAST(l_suppkey AS BIGINT) * 2 + 1 AS v,
    min(CAST(l_quantity AS BIGINT)) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2
), e AS MATERIALIZED (
  SELECT least(u, v) AS ku, greatest(u, v) AS kv, w FROM we
), e2 AS MATERIALIZED (
  SELECT ku AS x, kv AS y, w, ku, kv FROM e
  UNION ALL SELECT kv, ku, w, ku, kv FROM e
), nn AS MATERIALIZED (SELECT DISTINCT x AS v FROM e2),
c0 AS MATERIALIZED (SELECT v, v AS c FROM nn)$roundSql,
tree AS MATERIALIZED (
  SELECT DISTINCT ku, kv, w FROM ($treeUnion)
), fin AS (
  SELECT (SELECT count(*) FROM nn) AS n_nodes,
    (SELECT count(DISTINCT c) FROM c$rounds) AS n_components,
    (SELECT count(*) FROM tree) AS n_tree_edges,
    (SELECT coalesce(sum(w), 0) FROM tree) AS total_weight,
    (SELECT coalesce(sum(ku * 1000000 + kv), 0) FROM tree)
      AS edge_checksum,
    ($unsSum) AS uns,
    (SELECT count(*) FROM e2
     JOIN c$rounds a ON e2.x = a.v JOIN c$rounds b ON e2.y = b.v
     WHERE a.c <> b.c) AS leftover
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
  CAST(n_components AS BIGINT) AS n_components,
  CAST(n_tree_edges AS BIGINT) AS n_tree_edges,
  CAST(total_weight AS BIGINT) AS total_weight,
  CAST(edge_checksum AS BIGINT) AS edge_checksum,
  (n_tree_edges = n_nodes - n_components) AS forest_valid,
  (uns = 0) AS fully_contracted,
  (leftover = 0) AS converged
FROM fin"""
    },

    // q224: the same 4 Feistel rounds unrolled — pure BIGINT shift/
    // mask/xor arithmetic, so both engines compute the identical
    // permutation key and the injectivity census is exact
    "q224_feistel_shuffle" -> {
      val roundKeys = Seq(40503L, 11665L, 30841L, 22621L)
      val rounds = roundKeys.zipWithIndex.map { case (k, i) =>
        s""", f${i + 1} AS (
  SELECT doc_id, r AS l,
    xor(l, (((r + $k) * 2654435761) % 4294967296) >> 16) AS r
  FROM f$i
)"""
      }.mkString
      s"""WITH f0 AS (
  SELECT doc_id, doc_id >> 16 AS l, doc_id & 65535 AS r
  FROM documents
)$rounds, k AS (
  SELECT doc_id, l * 65536 + r AS skey FROM f4
), cen AS (
  SELECT count(*) AS n_docs, count(DISTINCT skey) AS n_keys FROM k
)
SELECT row_number() OVER (ORDER BY skey ASC) AS rk, doc_id, skey,
  n_docs, n_keys, (n_docs = n_keys) AS bijective
FROM (SELECT * FROM k ORDER BY skey ASC LIMIT 20), cen
ORDER BY rk"""
    },

    // q236: identical arrival shards, identical span algebra for the
    // sorted layout (value v covers sorted shards (cum−c)//S ..
    // (cum−1)//S), identical skip condition — integers everywhere
    // q271: the oracle rebuilds both rings from the same md5
    // positions (ring A = ring B's n<20 subset) and replays the
    // clockwise-successor rule with argmin-over-(p >= h)
    "q271_consistent_hash" ->
      """WITH ring AS (
        |  SELECT n::INT AS n,
        |    ('0x' || md5('node-' || n || '-v' || v)[1:15])::BIGINT AS p
        |  FROM range(0, 21) t(n) CROSS JOIN range(0, 16) u(v)
        |), docs AS (
        |  SELECT doc_id,
        |    ('0x' || md5('doc-' || doc_id)[1:15])::BIGINT AS h
        |  FROM documents
        |), asg AS (
        |  SELECT doc_id,
        |    coalesce(
        |      (SELECT min_by(r.n, r.p) FROM ring r
        |       WHERE r.n < 20 AND r.p >= d.h),
        |      (SELECT min_by(r.n, r.p) FROM ring r WHERE r.n < 20))
        |      AS a,
        |    coalesce(
        |      (SELECT min_by(r.n, r.p) FROM ring r WHERE r.p >= d.h),
        |      (SELECT min_by(r.n, r.p) FROM ring r)) AS b
        |  FROM docs d
        |), an AS (
        |  SELECT a AS node, count(*)::BIGINT AS n_a FROM asg GROUP BY a
        |), bn AS (
        |  SELECT b AS node, count(*)::BIGINT AS n_b,
        |    sum(CASE WHEN a <> b THEN 1 ELSE 0 END)::BIGINT AS moved_in
        |  FROM asg GROUP BY b
        |)
        |SELECT t.n::INT AS node, coalesce(an.n_a, 0) AS n_a,
        |  coalesce(bn.n_b, 0) AS n_b,
        |  coalesce(bn.moved_in, 0) AS moved_in
        |FROM range(0, 21) t(n)
        |LEFT JOIN an ON an.node = t.n LEFT JOIN bn ON bn.node = t.n
        |ORDER BY node""".stripMargin,
    "q236_zonemap_forecast" ->
      """WITH r AS (
        |  SELECT doc_id, length(text)::BIGINT AS v FROM documents
        |), pr AS (
        |  SELECT * FROM (VALUES (0::BIGINT, 199::BIGINT), (200, 299),
        |    (300, 399), (310, 329), (400, 100000)) AS t(lo, hi)
        |), arr AS (
        |  SELECT doc_id // 1000 AS shard, min(v) AS mn, max(v) AS mx
        |  FROM r GROUP BY 1
        |), cumt AS (
        |  SELECT v, c, sum(c) OVER (ORDER BY v) AS cum
        |  FROM (SELECT v, count(*) AS c FROM r GROUP BY v)
        |), spans AS (
        |  SELECT v, unnest(range(CAST((cum - c) // 1000 AS BIGINT),
        |    CAST((cum - 1) // 1000 + 1 AS BIGINT))) AS shard
        |  FROM cumt
        |), srt AS (
        |  SELECT shard, min(v) AS mn, max(v) AS mx FROM spans GROUP BY 1
        |), u AS (
        |  SELECT 'arrival' AS layout, lo, hi, mn, mx FROM arr, pr
        |  UNION ALL
        |  SELECT 'sorted' AS layout, lo, hi, mn, mx FROM srt, pr
        |), f AS (
        |  SELECT layout, lo, hi, count(*)::BIGINT AS n_shards,
        |    CAST(sum(CASE WHEN mx < lo OR mn > hi THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_skipped
        |  FROM u GROUP BY 1, 2, 3
        |), tot AS (SELECT count(*)::BIGINT AS n FROM r),
        |sel AS (
        |  SELECT lo, hi, CAST(sum(CASE WHEN v BETWEEN lo AND hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        |  FROM r, pr GROUP BY 1, 2
        |)
        |SELECT layout, lo, hi, n_shards, n_skipped,
        |  round(n_skipped::DOUBLE / n_shards, 6) AS skip_ratio,
        |  n_match, round(n_match::DOUBLE / n, 6) AS selectivity
        |FROM f JOIN sel USING (lo, hi), tot
        |ORDER BY layout, lo""".stripMargin,

    // q247: the same 7-way cover explode, the same observed-range
    // clip — exact trailing-week distincts per day
    "q247_rolling_distinct" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |), b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
        |x AS (
        |  SELECT user_id, day + i::INT AS win_end
        |  FROM e, unnest(range(0, 7)) AS u(i)
        |)
        |SELECT win_end,
        |  count(DISTINCT user_id)::BIGINT AS users_7d,
        |  count(*)::BIGINT AS events_7d
        |FROM x, b WHERE win_end BETWEEN lo AND hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q231: the oracle joins on the raw inequality — DuckDB at sf0.01
    // affords the per-customer quadratic the Spark side blocks away
    "q231_band_join" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck, o_orderkey AS ok,
        |    date_diff('day', DATE '1992-01-01', o_orderdate::DATE)
        |      AS day
        |  FROM orders
        |)
        |SELECT abs(a.day - b.day) AS gap_days,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT a.ck) AS BIGINT) AS n_customers
        |FROM o a JOIN o b ON a.ck = b.ck AND a.ok < b.ok
        |  AND abs(a.day - b.day) <= 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q203_sssp" -> {
      val rounds = (1 to 6).map { r =>
        s""",
d$r AS MATERIALIZED (
  SELECT v, min(dist) AS dist FROM (
    SELECT e.dst AS v, d.dist + e.w AS dist
    FROM e JOIN d${r - 1} d ON e.src = d.v
    UNION ALL SELECT v, dist FROM d${r - 1}) GROUP BY 1
)"""
      }.mkString
      s"""WITH we AS MATERIALIZED (
  SELECT CAST(o_custkey AS BIGINT) * 2 AS a,
    CAST(l_suppkey AS BIGINT) * 2 + 1 AS b,
    min(CAST(l_quantity AS BIGINT)) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2
), e AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM we
  UNION ALL SELECT b, a, w FROM we
), nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM e),
d0 AS MATERIALIZED (
  SELECT v, CAST(0 AS BIGINT) AS dist FROM nodes WHERE v % 200 = 0
)$rounds
SELECT CAST(count(*) AS BIGINT) AS n_reached,
  CAST(sum(dist) AS BIGINT) AS sum_dist, max(dist) AS max_dist,
  (SELECT count(*) FROM nodes) - CAST(count(*) AS BIGINT)
    AS n_unreached,
  (SELECT count(*) FROM d6 x LEFT JOIN d5 y ON x.v = y.v
   WHERE y.dist IS NULL OR x.dist < y.dist) = 0 AS converged
FROM d6"""
    },
    // q257: the same unrolled-relaxation pattern as q203, keyed
    // (v, seed); the nearest-landmark cell packs (dist, seed) into
    // one integer so ties break identically in both engines
    "q257_landmark_bfs" -> {
      val rounds = (1 to 6).map { r =>
        s""",
d$r AS MATERIALIZED (
  SELECT v, seed, min(dist) AS dist FROM (
    SELECT e.dst AS v, d.seed AS seed, d.dist + 1 AS dist
    FROM e JOIN d${r - 1} d ON e.src = d.v
    UNION ALL SELECT v, seed, dist FROM d${r - 1}) GROUP BY 1, 2
)"""
      }.mkString
      s"""WITH we AS MATERIALIZED (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2 AS a,
    CAST(l_suppkey AS BIGINT) * 2 + 1 AS b
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), e AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM we
  UNION ALL SELECT b, a FROM we
), nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM e),
d0 AS MATERIALIZED (
  SELECT v, v AS seed, CAST(0 AS BIGINT) AS dist
  FROM (SELECT v FROM nodes WHERE v % 2 = 0 ORDER BY v LIMIT 4)
)$rounds,
cells AS (
  SELECT (key % 1000000) AS seed,
    CAST(count(*) AS BIGINT) AS n_assigned
  FROM (SELECT v, min(dist * 1000000 + seed) AS key
        FROM d6 GROUP BY 1)
  GROUP BY 1
),
conv AS (
  SELECT (SELECT count(*) FROM d6 x
          LEFT JOIN d5 y ON x.v = y.v AND x.seed = y.seed
          WHERE y.dist IS NULL OR x.dist < y.dist) = 0 AS converged
)
SELECT d6.seed, CAST(count(*) AS BIGINT) AS n_reached,
  CAST(sum(dist) AS BIGINT) AS sum_dist, max(dist) AS ecc6,
  coalesce(any_value(cells.n_assigned), 0) AS n_assigned,
  any_value(conv.converged) AS converged
FROM d6 LEFT JOIN cells ON d6.seed = cells.seed, conv
GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // same md5-uniform Poisson draws (thresholds shared via
    // poissonCaseSql), integer replicate sums, nearest-rank CI
    "q206_bootstrap_ci" -> {
      val u = "(('0x' || md5(doc_id || ':' || r.range)[1:8])::BIGINT" +
        " / 4294967296.0)"
      s"""WITH pool AS MATERIALIZED (
  SELECT doc_id, n_chars AS x FROM documents
), obs AS (
  SELECT CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM pool
), reps AS MATERIALIZED (
  SELECT p, CAST(sum(w) AS BIGINT) AS wsum,
    CAST(sum(w * x) AS BIGINT) AS ssum
  FROM (
    SELECT x, r.range AS p, ${poissonCaseSql(u)} AS w
    FROM pool CROSS JOIN range(100) r
  ) GROUP BY p HAVING sum(w) > 0
), m AS (
  SELECT round(ssum::DOUBLE / wsum, 6) AS mean, p,
    row_number() OVER (ORDER BY round(ssum::DOUBLE / wsum, 6), p)
      AS rk,
    count(*) OVER () AS nr
  FROM reps
)
SELECT (SELECT n FROM obs) AS n_docs,
  (SELECT round(s::DOUBLE / n, 6) FROM obs) AS mean_obs,
  (SELECT CAST(count(*) AS BIGINT) FROM reps) AS n_replicates,
  (SELECT mean FROM m WHERE rk = CAST(ceil(0.025 * nr) AS BIGINT))
    AS ci_lo,
  (SELECT mean FROM m WHERE rk = CAST(ceil(0.975 * nr) AS BIGINT))
    AS ci_hi"""
    },
    // same md5-parity permutations and integer cross-multiplied
    // extremeness census
    "q205_perm_test" ->
      """WITH pool AS MATERIALIZED (
        |  SELECT doc_id, source, n_chars AS x FROM documents
        |  WHERE source IN ('src0', 'src1')
        |), obs AS (
        |  SELECT
        |    CAST(sum(CASE WHEN source = 'src0' THEN x END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN source = 'src1' THEN x END) AS BIGINT) AS sb,
        |    CAST(sum(CASE WHEN source = 'src1' THEN 1 END) AS BIGINT) AS nb
        |  FROM pool
        |), bits AS (
        |  SELECT x, r.range AS p,
        |    ('0x' || md5(doc_id || ':' || r.range)[1:1])::BIGINT % 2
        |      AS bit
        |  FROM pool CROSS JOIN range(100) r
        |), perm AS (
        |  SELECT p,
        |    CAST(sum(CASE WHEN bit = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
        |    CAST(sum(CASE WHEN bit = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN bit = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN bit = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM bits GROUP BY p
        |), ext AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_extreme FROM perm, obs
        |  WHERE n0 > 0 AND n1 > 0
        |    AND abs(s0 * n1 - s1 * n0) * (na * nb)
        |      >= abs(sa * nb - sb * na) * (n0 * n1)
        |)
        |SELECT na AS n_a, nb AS n_b,
        |  round(sa::DOUBLE / na, 6) AS mean_a,
        |  round(sb::DOUBLE / nb, 6) AS mean_b,
        |  abs(sa * nb - sb * na) AS obs_scaled, n_extreme,
        |  round((n_extreme + 1)::DOUBLE / 101, 6) AS p_value
        |FROM obs, ext""".stripMargin,
    // same one-aggregate-per-candidate violation census
    "q204_fd_audit" -> {
      def fd(name: String, table: String, lhs: String, rhs: String) =
        s"""SELECT '$name' AS fd, CAST(count(*) AS BIGINT) AS n_lhs,
  CAST(sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS violating_lhs,
  CAST(sum(CASE WHEN nrhs > 1 THEN nrows ELSE 0 END) AS BIGINT)
    AS violating_rows,
  sum(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (SELECT $lhs, count(DISTINCT $rhs) AS nrhs,
        CAST(count(*) AS BIGINT) AS nrows
      FROM $table GROUP BY $lhs)"""
      Seq(
        fd("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
        fd("l_orderkey,l_linenumber->l_partkey", "lineitem",
          "l_orderkey, l_linenumber", "l_partkey"),
        fd("c_nationkey->c_mktsegment", "customer", "c_nationkey",
          "c_mktsegment"),
        fd("o_custkey->o_orderstatus", "orders", "o_custkey",
          "o_orderstatus"),
        fd("l_orderkey->l_suppkey", "lineitem", "l_orderkey",
          "l_suppkey")
      ).mkString("\nUNION ALL\n")
    },
    // same order-side wedge enumeration and integer C(m,2) census
    "q201_butterflies" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        |), w AS (
        |  SELECT a.p AS p1, b.p AS p2
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |), cd AS (
        |  SELECT p1, p2, CAST(count(*) AS BIGINT) AS m FROM w GROUP BY 1, 2
        |)
        |SELECT CAST(count(*) AS BIGINT) AS wedge_pairs,
        |  CAST(sum(m) AS BIGINT) AS wedges,
        |  CAST(sum((m * (m - 1)) // 2) AS BIGINT) AS butterflies,
        |  max(m) AS max_codeg
        |FROM cd""".stripMargin,
    "q159_item_cosine" ->
      """WITH uc AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), norms AS (
        |  SELECT event_type, CAST(sum(c * c) AS BIGINT) AS n2
        |  FROM uc GROUP BY 1
        |), p AS (
        |  SELECT x.event_type AS ia, y.event_type AS ib,
        |    CAST(sum(x.c * y.c) AS BIGINT) AS dot
        |  FROM uc x JOIN uc y ON x.user_id = y.user_id
        |    AND x.event_type < y.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT ia, ib, dot,
        |  round(dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)),
        |    6) AS cosine
        |FROM p JOIN norms na ON na.event_type = p.ia
        |  JOIN norms nb ON nb.event_type = p.ib
        |ORDER BY ia, ib""".stripMargin,
    "q160_hop_windows" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) AS us,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events
        |), h AS (
        |  SELECT event_type, v,
        |    (us // 10800000000) * 10800000000 - k * 10800000000
        |      AS win_start_us
        |  FROM e, unnest([0, 1]) AS u(k)
        |)
        |SELECT win_start_us, event_type, count(*) AS n,
        |  round(sum(v)::DOUBLE, 6) AS sum_value
        |FROM h GROUP BY 1, 2""".stripMargin,

    // same HRW argmax via a (h DESC, shard DESC) window — the total
    // order Spark's max(struct) comparison encodes
    "q222_rendezvous_shards" ->
      """WITH sc AS MATERIALIZED (
        |  SELECT doc_id, u.shard,
        |    ('0x' || substring(md5('rvh:' || doc_id || ':' || u.shard),
        |      1, 12))::BIGINT AS h
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, 15)) AS shard) u
        |), o16 AS (
        |  SELECT doc_id, shard AS owner16 FROM (
        |    SELECT doc_id, shard, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY h DESC, shard DESC) AS rn
        |    FROM sc) WHERE rn = 1
        |), o15 AS (
        |  SELECT doc_id, shard AS owner15 FROM (
        |    SELECT doc_id, shard, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY h DESC, shard DESC) AS rn
        |    FROM sc WHERE shard != 7) WHERE rn = 1
        |), own AS MATERIALIZED (
        |  SELECT doc_id, owner16, owner15
        |  FROM o16 JOIN o15 USING (doc_id)
        |), gate AS (
        |  SELECT
        |    sum(CASE WHEN owner16 != owner15 THEN 1 ELSE 0 END)
        |      AS n_moved,
        |    sum(CASE WHEN owner16 = 7 THEN 1 ELSE 0 END)
        |      AS n_on_removed
        |  FROM own
        |), b AS (
        |  SELECT owner16 AS shard, count(*) AS n_before
        |  FROM own GROUP BY 1
        |), a AS (
        |  SELECT owner15 AS shard, count(*) AS n_after,
        |    sum(CASE WHEN owner16 = 7 THEN 1 ELSE 0 END) AS n_gained
        |  FROM own GROUP BY 1
        |)
        |SELECT coalesce(b.shard, a.shard) AS shard,
        |  CAST(coalesce(n_before, 0) AS BIGINT) AS n_before,
        |  CAST(coalesce(n_after, 0) AS BIGINT) AS n_after,
        |  CAST(coalesce(n_gained, 0) AS BIGINT) AS n_gained,
        |  CAST(n_moved AS BIGINT) AS total_moved,
        |  (n_moved = n_on_removed) AS minimal_disruption
        |FROM b FULL JOIN a ON b.shard = a.shard, gate""".stripMargin,
    "q181_negative_edges" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS ec,
        |    CAST(l_suppkey AS BIGINT) AS es
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), mx AS (
        |  SELECT (SELECT max(c_custkey) FROM customer) AS nc,
        |    (SELECT max(s_suppkey) FROM supplier) AS ns
        |), p AS (
        |  SELECT i AS id,
        |    ('0x' || substring(md5('neg-c-' || i::VARCHAR), 1, 15))
        |      ::BIGINT % mx.nc + 1 AS c,
        |    ('0x' || substring(md5('neg-s-' || i::VARCHAR), 1, 15))
        |      ::BIGINT % mx.ns + 1 AS sup
        |  FROM unnest(range(0, 5000)) AS t(i), mx
        |), negs AS (
        |  SELECT id, c, sup FROM p
        |  WHERE NOT EXISTS (SELECT 1 FROM e
        |    WHERE e.ec = p.c AND e.es = p.sup)
        |  ORDER BY id LIMIT 1000
        |)
        |SELECT 1000::BIGINT AS n_requested, count(*) AS n_selected,
        |  0::BIGINT AS real_hits,
        |  bit_xor(c * 100000 + sup)::BIGINT AS sample_xor,
        |  true AS clean
        |FROM negs""".stripMargin,
    "q179_group_folds" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    (('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT
        |      % 5)::INT AS fold
        |  FROM events
        |), n AS (SELECT count(*) AS n FROM e)
        |SELECT fold, count(DISTINCT user_id) AS users,
        |  count(*) AS events,
        |  round(count(*)::DOUBLE / n.n, 6) AS frac,
        |  0::BIGINT AS leaked_users
        |FROM e, n GROUP BY fold, n.n""".stripMargin,
    "q180_ks_drift" ->
      """WITH ev AS (
        |  SELECT event_type, value FROM events
        |  WHERE event_type IN ('click', 'view')
        |), g AS (
        |  SELECT value,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d2
        |  FROM ev GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(d1) AS BIGINT) AS n1,
        |    CAST(sum(d2) AS BIGINT) AS n2 FROM g
        |), r AS (
        |  SELECT abs(sum(d1) OVER w * t.n2 - sum(d2) OVER w * t.n1)
        |    AS dev, t.n1, t.n2
        |  FROM g, t
        |  WINDOW w AS (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT n1, n2, CAST(max(dev) AS BIGINT) AS ks_num,
        |  round(CAST(max(dev) AS BIGINT)::DOUBLE / (n1::DOUBLE * n2), 6)
        |    AS ks
        |FROM r GROUP BY n1, n2""".stripMargin,
    // the sweep is over DISTINCT scores (GROUP BY), so the window's
    // ORDER BY is total — no tie-order flake; auc_num stays integer
    // until the one final division
    "q187_auc_exact" ->
      """WITH g AS (
        |  SELECT o_totalprice AS score,
        |    CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0
        |      END) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM orders GROUP BY 1
        |), c AS (
        |  SELECT pos, m, COALESCE(sum(m) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM g
        |), t AS (
        |  SELECT (SELECT CAST(sum(pos) AS BIGINT) FROM g) AS np,
        |    (SELECT CAST(sum(m) - sum(pos) AS BIGINT) FROM g) AS nn,
        |    CAST(sum(pos * (2 * cb + m + 1)) AS BIGINT) AS r2
        |  FROM c
        |)
        |SELECT np AS n_pos, nn AS n_neg,
        |  CAST(r2 - np * (np + 1) AS BIGINT) AS auc_num,
        |  round((r2 - np * (np + 1))::DOUBLE / (2.0 * np * nn), 6) AS auc
        |FROM t""".stripMargin,
    // per-row score/sqerr rounded to 6 then DECIMAL-summed, exactly
    // as the Spark side; LEAST caps the score = 1.0 row into bin 9
    "q190_calibration_bins" ->
      """WITH o AS (
        |  SELECT o_totalprice AS price,
        |    CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS p
        |  FROM orders
        |), mx AS (SELECT max(price) AS mx FROM o),
        |sc AS (
        |  SELECT round(price / mx, 6) AS score, p,
        |    LEAST(CAST(floor(round(price / mx, 6) * 10) AS BIGINT), 9)
        |      AS bin,
        |    round((round(price / mx, 6) - p)^2, 6) AS sqerr
        |  FROM o, mx
        |)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(p) AS BIGINT) AS n_pos,
        |  round(sum(CAST(score AS DECIMAL(28,6)))::DOUBLE / count(*), 6)
        |    AS mean_score,
        |  round(sum(p)::DOUBLE / count(*), 6) AS pos_rate,
        |  round(sum(CAST(sqerr AS DECIMAL(28,6)))::DOUBLE / count(*), 6)
        |    AS brier,
        |  round(abs(round(sum(CAST(score AS DECIMAL(28,6)))::DOUBLE
        |      / count(*), 6)
        |    - round(sum(p)::DOUBLE / count(*), 6)), 6) AS abs_gap
        |FROM sc GROUP BY bin""".stripMargin,
    // the ranking is the shared deterministic total order
    // (score DESC, key ASC); per-positive precision rounded to 9 and
    // DECIMAL-summed, one double division at the end — as the engine
    "q191_average_precision" ->
      """WITH sc AS (
        |  SELECT o_totalprice AS score, o_orderkey AS k,
        |    CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS p
        |  FROM orders
        |), r AS (
        |  SELECT p,
        |    row_number() OVER (ORDER BY score DESC, k ASC) AS rk,
        |    sum(p) OVER (ORDER BY score DESC, k ASC
        |      ROWS UNBOUNDED PRECEDING) AS cp
        |  FROM sc
        |), t AS (
        |  SELECT CAST(sum(p) AS BIGINT) AS np,
        |    sum(CASE WHEN p = 1 THEN
        |      CAST(round(cp::DOUBLE / rk, 9) AS DECIMAL(28,9))
        |      ELSE 0 END) AS sp
        |  FROM r
        |)
        |SELECT np AS n_pos, sp::DOUBLE AS sum_prec,
        |  round(sp::DOUBLE / np, 9) AS ap
        |FROM t""".stripMargin,
    // per-segment twin: the window ORDER BY is over DISTINCT
    // (segment, score) groups — total within each partition
    "q189_group_auc" ->
      """WITH sc AS (
        |  SELECT c.c_mktsegment AS segment, o.o_totalprice AS score,
        |    CASE WHEN o.o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS p
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |), g AS (
        |  SELECT segment, score, CAST(sum(p) AS BIGINT) AS pos,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM sc GROUP BY segment, score
        |), c AS (
        |  SELECT segment, pos, m, COALESCE(sum(m) OVER (
        |    PARTITION BY segment ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM g
        |), t AS (
        |  SELECT segment, CAST(sum(pos) AS BIGINT) AS np,
        |    CAST(sum(m) - sum(pos) AS BIGINT) AS nn,
        |    CAST(sum(pos * (2 * cb + m + 1)) AS BIGINT) AS r2
        |  FROM c GROUP BY segment
        |)
        |SELECT segment, np AS n_pos, nn AS n_neg,
        |  CAST(r2 - np * (np + 1) AS BIGINT) AS auc_num,
        |  CASE WHEN np = 0 OR nn = 0 THEN NULL ELSE
        |    round((r2 - np * (np + 1))::DOUBLE / (2.0 * np * nn), 6) END
        |    AS auc
        |FROM t""".stripMargin,
    "q176_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, value,
        |    lead(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id)
        |      - epoch_us(ts) AS dt
        |  FROM events
        |)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dt) AS BIGINT) AS span_us,
        |  round(sum(CAST(round(value * dt, 6) AS DECIMAL(28,6)))::DOUBLE
        |    / sum(dt), 6) AS twap
        |FROM e WHERE dt IS NOT NULL
        |GROUP BY user_id""".stripMargin,
    "q174_pit_join" ->
      """WITH s AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    event_type AS state,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), v AS (
        |  SELECT user_id, event_id, us, state FROM s
        |  WHERE prev IS NULL OR prev <> state
        |), dim AS (
        |  SELECT user_id, state, us AS valid_from_us,
        |    lead(us) OVER
        |      (PARTITION BY user_id ORDER BY us, event_id)
        |      AS valid_to_us
        |  FROM v
        |), ev AS (SELECT user_id, epoch_us(ts) AS ets FROM events)
        |SELECT d.state, count(*) AS n_events, true AS tiling_exact
        |FROM ev e JOIN dim d ON e.user_id = d.user_id
        |  AND d.valid_from_us <= e.ets
        |  AND (d.valid_to_us IS NULL OR e.ets < d.valid_to_us)
        |GROUP BY d.state""".stripMargin,
    "q175_table_profile" -> ProfileCols.map(k =>
      s"""SELECT '$k' AS "column",
         |  (SELECT count(*) FROM customer) AS n_rows,
         |  CAST(sum(CASE WHEN $k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS nulls,
         |  count(DISTINCT $k) AS ndv,
         |  min($k)::VARCHAR AS min_s, max($k)::VARCHAR AS max_s
         |FROM customer""".stripMargin).mkString("\nUNION ALL\n"),
    "q171_schema_evolution" ->
      """SELECT source, count(*) AS docs,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS docs_with_lang,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END)
        |    AS BIGINT) AS chars_known
        |FROM documents GROUP BY source""".stripMargin,
    "q172_snapshot_diff" ->
      """WITH b AS (SELECT count(*) AS n FROM documents),
        |a AS (SELECT count(*) AS n FROM documents WHERE doc_id % 10 = 0)
        |SELECT b.n AS n_v1, b.n + a.n AS n_v2, a.n AS added,
        |  0::BIGINT AS removed, 0::BIGINT AS changed,
        |  b.n AS unchanged
        |FROM b, a""".stripMargin,
    "q173_consistent_hash" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
        |      AS dpos
        |  FROM documents
        |), s16 AS (
        |  SELECT ('0x' || substring(md5('shard-' || i::VARCHAR), 1, 15))
        |    ::BIGINT AS spos
        |  FROM unnest(range(0, 16)) AS t(i)
        |), s17 AS (
        |  SELECT ('0x' || substring(md5('shard-' || i::VARCHAR), 1, 15))
        |    ::BIGINT AS spos
        |  FROM unnest(range(0, 17)) AS t(i)
        |), a16 AS (
        |  SELECT d.doc_id, coalesce(
        |    min(CASE WHEN s.spos >= d.dpos THEN s.spos END),
        |    min(s.spos)) AS p16
        |  FROM docs d, s16 s GROUP BY d.doc_id
        |), a17 AS (
        |  SELECT d.doc_id, coalesce(
        |    min(CASE WHEN s.spos >= d.dpos THEN s.spos END),
        |    min(s.spos)) AS p17
        |  FROM docs d, s17 s GROUP BY d.doc_id
        |)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(CASE WHEN p16 <> p17 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS moved,
        |  round(sum(CASE WHEN p16 <> p17 THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS moved_frac
        |FROM a16 JOIN a17 USING (doc_id)""".stripMargin,
    "q167_anomaly_days" ->
      """WITH d AS (
        |  SELECT event_type, ts::DATE AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), w AS (
        |  SELECT event_type, day, n,
        |    CAST(sum(n) OVER tw AS BIGINT) AS s,
        |    CAST(sum(n * n) OVER tw AS BIGINT) AS sq,
        |    count(*) OVER tw AS c
        |  FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, (day - DATE '1970-01-01') AS day_epoch, n,
        |  round((n - s / c) / sqrt((sq - s * s / c) / c), 6) AS z
        |FROM w
        |WHERE c >= 7 AND sqrt((sq - s * s / c) / c) > 0
        |  AND abs((n - s / c) / sqrt((sq - s * s / c) / c)) > 2""".stripMargin,
    "q166_event_motifs" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER w AS t2,
        |    lag(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |)
        |SELECT t3 || '>' || t2 || '>' || event_type AS motif,
        |  count(*) AS n
        |FROM s WHERE t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, motif LIMIT 20""".stripMargin,
    "q165_ivm_join" ->
      """WITH j AS (
        |  SELECT o_orderkey, o_custkey, l_linenumber,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS q
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), t AS (
        |  SELECT count(*) AS n_total, sum(q) AS qty FROM j
        |), b AS (
        |  SELECT count(*) AS n_base FROM j
        |  WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 3
        |)
        |SELECT b.n_base, t.n_total - b.n_base AS n_delta, t.n_total,
        |  t.qty::DOUBLE AS qty_total, true AS inc_eq_full
        |FROM b, t""".stripMargin,
    "q163_outlier_trim" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |), b AS (
        |  SELECT event_type,
        |    max(CASE WHEN rn = greatest(1, ceil(n * 0.01))
        |      THEN value END) AS p_lo,
        |    max(CASE WHEN rn = ceil(n * 0.99) THEN value END) AS p_hi
        |  FROM r GROUP BY 1
        |)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CASE WHEN value < p_lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_out_low,
        |  CAST(sum(CASE WHEN value > p_hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_out_high,
        |  round(sum(CASE WHEN value BETWEEN p_lo AND p_hi
        |      THEN CAST(value AS DECIMAL(18,6)) END)::DOUBLE
        |    / sum(CASE WHEN value BETWEEN p_lo AND p_hi THEN 1 ELSE 0
        |      END), 6) AS trimmed_mean,
        |  round(max(p_lo), 6) AS p_lo, round(max(p_hi), 6) AS p_hi
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type""".stripMargin,
    "q164_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, ts::DATE AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), span AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1
        |), cal AS (
        |  SELECT user_id, unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS day
        |  FROM span
        |), filled AS (
        |  SELECT cal.user_id, cal.day, coalesce(daily.n, 0) AS n
        |  FROM cal LEFT JOIN daily USING (user_id, day)
        |), zg AS (
        |  SELECT user_id,
        |    day - CAST(row_number() OVER
        |      (PARTITION BY user_id ORDER BY day) AS INT) AS grp
        |  FROM filled WHERE n = 0
        |), runs AS (
        |  SELECT user_id, grp, count(*) AS run FROM zg GROUP BY 1, 2
        |), lz AS (
        |  SELECT user_id, max(run) AS longest_zero_run
        |  FROM runs GROUP BY 1
        |)
        |SELECT f.user_id, count(*) AS span_days,
        |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS active_days,
        |  CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS zero_days,
        |  CAST(sum(n) AS BIGINT) AS total_events,
        |  coalesce(max(lz.longest_zero_run), 0) AS longest_zero_run
        |FROM filled f LEFT JOIN lz ON f.user_id = lz.user_id
        |GROUP BY f.user_id""".stripMargin
  )

  /** Shared session CTE (8h gap — mirrors [[sessions]]) for the q150 /
    * q154 oracles. */
  private lazy val sessionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
      |), n AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN lag(us) OVER w IS NULL
      |      OR us - lag(us) OVER w > 28800000000 THEN 1 ELSE 0 END
      |      AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |), sn AS (
      |  SELECT user_id, us, sum(new_sess) OVER
      |    (PARTITION BY user_id ORDER BY us, event_id
      |     ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM n
      |), sess AS (
      |  SELECT user_id, sess_id, min(us) AS a_us, max(us) AS b_us,
      |    count(*) AS n_events
      |  FROM sn GROUP BY 1, 2
      |)""".stripMargin
}
