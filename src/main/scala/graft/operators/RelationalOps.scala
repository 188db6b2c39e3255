package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator parity suite — every relational plan node of the
  * reference (SURVEY.md §2.1) expressed Spark-first, each with a DuckDB
  * oracle (SparkEntry.oracleSql).
  *
  * Conventions shared with the oracles:
  *  - Double SUMs go through DECIMAL(18,4) so the sum is exact and
  *    order-independent, then cast back to double -> bit-identical
  *    results between Spark and DuckDB regardless of partial-agg order.
  *  - Every query's output is a deterministic row set (unique keys or
  *    full ORDER BY before LIMIT).
  *  - Reference DECIMAL == C double (SURVEY §1.2), so doubles stay
  *    DoubleType throughout.
  */
object RelationalOps {

  /** Exact, order-independent sum of a double column (see above). */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // SeqScan + Filter + Projection (reference seq_scan_executor.cpp:20-56,
    // filter_executor.cpp, projection_executor.cpp). Predicate + column
    // pruning reach the parquet scan via Catalyst pushdown.
    "q01_scan_filter_project" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    }),

    // Projection with arithmetic (reference arithmetic_expression.h:33 has
    // + and - only; * is our superset for revenue math). Pure scalar IEEE
    // ops are bit-identical across engines, no rounding needed.
    "q02_projection_arith" -> ((s, d) => {
      Tables.load(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") - col("l_discount") * col("l_extendedprice"))
          .as("net"),
        (col("l_quantity") + lit(5.0)).as("qty_plus"))
    }),

    // Sort + Limit fused to TopN (reference sort_limit_as_topn.cpp:133-151;
    // Spark plans TakeOrderedAndProject — verified in RelationalSpec).
    "q03_topn" -> ((s, d) => {
      Tables.load(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Hash aggregation: group-by keys + count_star/count/sum/min/max
    // (reference aggregation_plan.h:37-93; CombineAggregateValues
    // semantics in aggregation_executor.h:46-64).
    "q04_agg_group" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"), // integral doubles: exact
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // Global aggregate over empty input emits one row: count=0, others
    // NULL (reference p3.06-empty-table.slt semantics).
    "q05_agg_empty" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .filter(col("l_quantity") < 0)
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("s"),
          min(col("l_quantity")).as("mn"))
    }),

    // DISTINCT — the reference plans it as group-by-all-columns
    // (plan_select.cpp:103-116); Spark's distinct() is the same agg.
    "q06_distinct" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
    }),

    // HAVING = filter over agg output (reference plan_aggregation.cpp:94-99).
    "q07_having" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 70)
    }),

    // HashJoin INNER equi-join (reference hash_join_plan.h:41-75).
    // customer is the small build side at query scale — but it GROWS
    // with the corpus, so the broadcast is AQE's runtime call (it
    // fires at any tested sf), not a mandatory hint that OOMs at
    // 100x.
    "q08_join_inner" -> ((s, d) => {
      val o = Tables.load(s, d, "orders").filter(col("o_totalprice") > 400000)
      val c = Tables.load(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_name")
    }),

    // HashJoin LEFT with probe misses -> count(col) skips nulls, so
    // customers with no orders report 0 (reference hash_join LEFT
    // semantics, hash_join_executor.cpp:160-163).
    "q09_join_left" -> ((s, d) => {
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    // NestedLoopJoin: theta (non-equi) join — Catalyst picks
    // BroadcastNestedLoopJoin (reference nested_loop_join_plan.h).
    "q10_join_theta" -> ((s, d) => {
      val n1 = Tables.load(s, d, "nation").as("n1")
      val n2 = Tables.load(s, d, "nation").as("n2")
      n1.join(n2, col("n1.n_regionkey") < col("n2.n_regionkey"))
        .select(col("n1.n_name").as("a"), col("n2.n_name").as("b"))
    }),

    // Multi-way join + agg (leaderboard-q2 shape,
    // p3.leaderboard-q2.slt). orders is NOT a dim — it grows 1:4 with
    // lineitem, so a mandatory broadcast of it is the q126
    // scale-killer class; the 100x plan shuffle-joins l⋈o on
    // orderkey and lets AQE broadcast whichever side actually
    // measures small at runtime (customer qualifies at every tested
    // sf).
    "q11_join3_agg" -> ((s, d) => {
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
      val l = Tables.load(s, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(dsum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Window: rank() with ties per ORDER BY equality (reference
    // window_function_executor.h:25-62).
    "q12_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc)
      Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          rank().over(w).as("rnk"))
    }),

    // Window agg with ORDER BY: reference fixes the frame to UNBOUNDED
    // PRECEDING..CURRENT ROW (window_function_executor.h:25-62) — which
    // is exactly Spark's (and DuckDB's) default RANGE frame.
    "q13_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      Tables.load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
            .cast("double").as("running"))
    }),

    // Window agg without ORDER BY: whole-partition frame (reference
    // window_function_executor.h:25-62).
    "q14_window_noorder" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
      Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          count(lit(1)).over(w).as("c"))
    }),

    // TopNPerGroup (reference topn_per_group_plan.h:31-60): row_number
    // over (partition, order) <= n with a unique tiebreak.
    "q15_topn_per_group" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    }),

    // String functions lower/upper (reference string_expression.h:33-74,
    // pinned by p0.01-lower-upper.slt).
    "q16_string_funcs" -> ((s, d) => {
      Tables.load(s, d, "part").select(
        col("p_partkey"), lower(col("p_name")).as("lo"),
        upper(col("p_brand")).as("up"))
    }),

    // Values: literal rows (reference values_executor.cpp:8-27).
    "q17_values" -> ((s, _) => {
      import s.implicits._
      Seq((1, Some("one"), Some(1.5)), (2, Some("two"), Some(2.5)),
        (3, None: Option[String], None: Option[Double]))
        .toDF("id", "name", "score")
    }),

    // Delete semantics as anti-join rewrite (reference
    // delete_executor.cpp; SURVEY §2.1 Delete -> left_anti).
    "q18_delete_antijoin" -> ((s, d) => {
      val l = Tables.load(s, d, "lineitem")
      val doomed = Tables.load(s, d, "orders")
        .filter(col("o_orderstatus") === "F").select("o_orderkey")
      l.join(doomed, l("l_orderkey") === doomed("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("remaining"))
    }),

    // Update semantics as recompute-projection (reference
    // update_executor.cpp planned as Filter+Update).
    "q19_update_rewrite" -> ((s, d) => {
      Tables.load(s, d, "supplier").select(
        col("s_suppkey"),
        when(col("s_acctbal") < 0, lit(0.0)).otherwise(col("s_acctbal"))
          .as("s_acctbal_new"))
    }),

    // Insert semantics = append (reference insert_executor.cpp:28-52):
    // table unionAll literal rows.
    "q20_insert_union" -> ((s, d) => {
      import s.implicits._
      val extra = Seq((98, "NEWLAND"), (99, "OTHERLAND"))
        .toDF("r_regionkey", "r_name")
      Tables.load(s, d, "region")
        .select(col("r_regionkey").cast("int"), col("r_name"))
        .unionAll(extra)
    }),

    // Limit over sorted input (reference limit_executor.cpp:21-47 — no
    // OFFSET, matching plan_select.cpp:162-164).
    "q21_sort_limit" -> ((s, d) => {
      Tables.load(s, d, "region").select("r_regionkey")
        .orderBy("r_regionkey").limit(3)
    }),

    // Multi-key Sort, ASC/DESC mix (reference sort_executor.cpp:12-45).
    "q22_sort_multi" -> ((s, d) => {
      Tables.load(s, d, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(col("s_nationkey").asc, col("s_acctbal").desc,
          col("s_suppkey").asc)
    }),

    // count(DISTINCT) — reference lowers DISTINCT to agg; the distinct
    // aggregate is the natural Spark extension.
    "q23_agg_count_distinct" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("sup_cnt"))
    }),

    // Time-window aggregation over the events table (batch form of the
    // streaming windowed agg; hour buckets keep it engine-agnostic).
    // Banded interval join — click→purchase attribution within 10
    // minutes, same user. The naive form is a theta join (a broadcast
    // nested loop at scale: |clicks|×|purchases| per user is the
    // classic range-join killer); the banded form buckets time into
    // Δ-width bands and EQUI-joins on (user, band), exploding each
    // purchase into its two candidate bands {b-1, b} — since
    // 0 < gap <= Δ implies the click's band is one of exactly those
    // two, every qualifying pair is found exactly once (no distinct
    // needed) and the join is a plain shuffled hash join that scales
    // with data, not with pairs. PlanShapeSpec asserts no nested loop.
    "q80_range_join" -> ((s, d) => {
      val delta = 600000000L // 10 min in microseconds
      val ev = Tables.load(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("c_us"))
        .withColumn("__b", floor(col("c_us") / delta))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("p_us"))
        .withColumn("__b", explode(array(
          floor(col("p_us") / delta) - 1, floor(col("p_us") / delta))))
      clicks.join(purchases, Seq("user_id", "__b"))
        .filter(col("p_us") > col("c_us")
          && col("p_us") - col("c_us") <= delta)
        .select(col("click_id"), col("purchase_id"),
          (col("p_us") - col("c_us")).as("gap_us"))
    }),

    "q24_events_hourly" -> ((s, d) => {
      Tables.load(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("string").as("h"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
    }),

    // As-of join — the point-in-time lookup Spark has no native
    // operator for: each purchase is joined to the user's most recent
    // view AT OR BEFORE it. Composed as one pass over the UNION of
    // both sides: a running last(ignoreNulls) window carries the
    // latest view forward, then the purchase rows are kept. ONE
    // shuffle on user_id, no range self-join, no per-row probe —
    // the shape that survives a billion events per key-day. Total
    // order (ts, event_id) makes ties deterministic on both engines.
    "q70_asof_join" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val isView = col("event_type") === "view"
      Tables.load(s, d, "events")
        .withColumn("last_view_val",
          last(when(isView, col("value")), ignoreNulls = true).over(w))
        .withColumn("last_view_ts",
          last(when(isView, col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("last_view_ts"),
          round(col("last_view_val"), 6).as("last_view_val"))
    }),

    // Superset joins the reference's binder accepts but its executors
    // reject (bound_join_ref.h:16 / join executors): full outer,
    // semi, anti — native in Spark, oracle-gated here.
    "q57_join_full_outer" -> ((s, d) => {
      val n = Tables.load(s, d, "nation").filter(col("n_regionkey") <= 2)
        .select(col("n_nationkey"), col("n_name"))
      val c = Tables.load(s, d, "customer")
        .filter(col("c_acctbal") > 9000)
        .groupBy("c_nationkey").agg(count(lit(1)).as("rich"))
      n.join(c, n("n_nationkey") === c("c_nationkey"), "full_outer")
        .select(col("n_nationkey"), col("n_name"), col("c_nationkey"),
          col("rich"))
    }),
    "q58_join_semi_anti" -> ((s, d) => {
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders").filter(col("o_totalprice") > 300000)
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("with_big_order"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("without_big_order"))
      semi.crossJoin(anti)
    }),

    // Grouping sets (absent in the reference entirely): ROLLUP with
    // grouping() markers so NULL group rows compare exactly.
    "q59_rollup" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"),
          grouping_id().cast("int").as("gid"))
    }),

    // CUBE: the full grouping-set lattice (both one-dimension margins,
    // unlike ROLLUP's prefix hierarchy) — one pass, Spark expands the
    // lattice inside the aggregate, no multi-scan union.
    "q98_cube" -> ((s, d) => {
      Tables.load(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"),
          grouping_id().cast("int").as("gid"))
    }),

    // Semi-structured: JSON props extraction + typed agg (Spark
    // get_json_object == DuckDB json_extract_string; both codegen/
    // native). The shape of every event-log pipeline.
    "q28_events_props_json" -> ((s, d) => {
      Tables.load(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
    }),

    // Gap-based sessionization (30-min silence closes a session) — the
    // batch twin of StreamOps.sessionize; StreamingSpec proves the
    // flatMapGroupsWithState version emits the identical session set.
    "q25_sessionize" -> ((s, d) => {
      graft.streaming.StreamOps
        .sessionizeBatch(Tables.load(s, d, "events"))
        .select(col("user_id"), col("start").cast("string").as("s_start"),
          col("end").cast("string").as("s_end"), col("events"),
          col("total_value"))
    }),

    // Full window-function suite beyond rank/row_number (q12-q15):
    // ntile, lag, lead, percent_rank, cume_dist, first_value — all six
    // over ONE window spec, so the whole query is a single exchange on
    // o_orderstatus + one sort within partitions (Spark fuses same-spec
    // window functions into one Window node; PlanShapeSpec pins it).
    // The ORDER BY carries a unique tiebreak (o_orderkey) so every
    // rank-derived value is cross-engine deterministic; the fractional
    // ranks are rounded to 9 decimals (exact small-int divisions —
    // rounding is belt-and-braces).
    "q123_window_suite" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.load(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).as("quartile"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        round(percent_rank().over(w), 9).as("pct_rank"),
        round(cume_dist().over(w), 9).as("cdist"),
        first(col("o_orderkey")).over(w).as("first_key"))
    })
  )

  /** DuckDB oracle SQL — same table names, same column aliases, same
    * decimal-exact sum trick. */
  val oracles: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05""".stripMargin,
    "q02_projection_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice - l_discount * l_extendedprice AS net,
        |  l_quantity + 5.0 AS qty_plus FROM lineitem""".stripMargin,
    "q03_topn" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_agg_group" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  sum(l_quantity) AS sum_qty,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q05_agg_empty" ->
      """SELECT count(*) AS cnt, sum(l_quantity) AS s, min(l_quantity) AS mn
        |FROM lineitem WHERE l_quantity < 0""".stripMargin,
    "q06_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q07_having" ->
      """SELECT l_suppkey, count(*) AS cnt FROM lineitem
        |GROUP BY l_suppkey HAVING count(*) > 70""".stripMargin,
    "q08_join_inner" ->
      """SELECT o_orderkey, o_totalprice, c_name FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 400000""".stripMargin,
    "q09_join_left" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "q10_join_theta" ->
      """SELECT n1.n_name AS a, n2.n_name AS b FROM nation n1
        |JOIN nation n2 ON n1.n_regionkey < n2.n_regionkey""".stripMargin,
    "q11_join3_agg" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q12_window_rank" ->
      """SELECT c_custkey, c_nationkey,
        |  rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk
        |FROM customer""".stripMargin,
    "q13_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE) AS running
        |FROM orders""".stripMargin,
    "q14_window_noorder" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  count(*) OVER (PARTITION BY l_returnflag) AS c
        |FROM lineitem""".stripMargin,
    "q15_topn_per_group" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) WHERE rn <= 3""".stripMargin,
    "q16_string_funcs" ->
      """SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up
        |FROM part""".stripMargin,
    "q17_values" ->
      """SELECT * FROM (VALUES (1, 'one', 1.5), (2, 'two', 2.5),
        |  (3, NULL, NULL)) AS t(id, name, score)""".stripMargin,
    "q18_delete_antijoin" ->
      """SELECT count(*) AS remaining FROM lineitem
        |WHERE l_orderkey NOT IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin,
    "q19_update_rewrite" ->
      """SELECT s_suppkey,
        |  CASE WHEN s_acctbal < 0 THEN 0.0 ELSE s_acctbal END AS s_acctbal_new
        |FROM supplier""".stripMargin,
    "q20_insert_union" ->
      """SELECT r_regionkey, r_name FROM region
        |UNION ALL
        |SELECT * FROM (VALUES (98, 'NEWLAND'), (99, 'OTHERLAND'))
        |  AS t(r_regionkey, r_name)""".stripMargin,
    "q21_sort_limit" ->
      "SELECT r_regionkey FROM region ORDER BY r_regionkey LIMIT 3",
    "q22_sort_multi" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC""".stripMargin,
    "q23_agg_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS sup_cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q80_range_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |)
        |SELECT c.event_id AS click_id, p.event_id AS purchase_id,
        |  p.us - c.us AS gap_us
        |FROM e c JOIN e p ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND p.us > c.us AND p.us - c.us <= 600000000""".stripMargin,
    "q24_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS h, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q70_asof_join" ->
      """SELECT event_id, user_id, ts, last_view_ts,
        |  round(last_view_val, 6) AS last_view_val
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'view' THEN value END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_view_val,
        |    last_value(CASE WHEN event_type = 'view' THEN ts END
        |      IGNORE NULLS) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS last_view_ts
        |  FROM events)
        |WHERE event_type = 'purchase'""".stripMargin,
    "q57_join_full_outer" ->
      """SELECT n.n_nationkey, n.n_name, c.c_nationkey, c.rich
        |FROM (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <= 2) n
        |FULL OUTER JOIN (
        |  SELECT c_nationkey, count(*) AS rich FROM customer
        |  WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
        |ON n.n_nationkey = c.c_nationkey""".stripMargin,
    "q58_join_semi_anti" ->
      """SELECT
        |  (SELECT count(*) FROM customer c WHERE EXISTS (
        |     SELECT 1 FROM orders o WHERE o.o_totalprice > 300000
        |       AND o.o_custkey = c.c_custkey)) AS with_big_order,
        |  (SELECT count(*) FROM customer c WHERE NOT EXISTS (
        |     SELECT 1 FROM orders o WHERE o.o_totalprice > 300000
        |       AND o.o_custkey = c.c_custkey)) AS without_big_order""".stripMargin,
    "q59_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS qty,
        |  (grouping(l_returnflag) * 2 + grouping(l_linestatus))::INT AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q98_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS qty,
        |  (grouping(l_returnflag) * 2 + grouping(l_linestatus))::INT AS gid
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q28_events_props_json" ->
      """SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        |  count(*) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q25_sessionize" ->
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
        |)
        |SELECT user_id, CAST(min(ts) AS VARCHAR) AS s_start,
        |  CAST(max(ts) AS VARCHAR) AS s_end, count(*)::INT AS events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "q123_window_suite" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  round(percent_rank() OVER w, 9) AS pct_rank,
        |  round(cume_dist() OVER w, 9) AS cdist,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin
  )
}
