package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Distribution-statistics operators — the audit passes a pipeline
  * runs over a corpus before trusting it: inequality/concentration
  * (Gini), digit-distribution fraud checks (Benford), rank
  * correlation (Spearman), trend and change-point detection over
  * daily series. The reference engine stops at plain aggregates;
  * these are supersets, each built on the repo's exact-algebra
  * idioms: integer cents, DistributedPrefix instead of global
  * windows, fixed shared literals where a transcendental constant is
  * unavoidable, and one final rounded division.
  */
object StatOps {

  private def r6(v: Double) = BigDecimal(v)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact Gini coefficient over a (v: long) frame of non-negative
    * integer amounts: G = (2·Σ i·v_i − (n+1)·Σv) / (n·Σv) with v
    * ascending, i = 1..n. Rank products never materialize per row:
    * group by value (c rows per distinct v), DistributedPrefix gives
    * the exclusive count C_before, and the group's Σi·v collapses to
    * the closed form v·(c·C_before + c(c+1)/2). Intra-tie order
    * cancels out of the formula, so the statistic is deterministic
    * with no tiebreak column. Per-group terms fit BIGINT; the global
    * sum is folded in BigInt (it crosses 2^53 at sf0.1 — an RDD
    * .sum() would silently lose low bits in its Double accumulator).
    * Split out so StatOpsSpec pins the closed forms (all-equal → 0,
    * one-holder-takes-all → (n-1)/n). */
  private[graft] def giniExact(amounts: DataFrame): DataFrame = {
    val s = amounts.sparkSession
    import s.implicits._
    val grouped = amounts.groupBy("v").agg(count(lit(1)).as("c"))
    val tot = grouped
      .agg(sum(col("c")).as("n"), sum(col("v") * col("c")).as("sv"))
      .head()
    val (n, sv) = (tot.getLong(0), tot.getLong(1))
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = grouped
      .repartitionByRange(parts, col("v").asc)
      .sortWithinPartitions("v")
      .as[(Long, Long)]
    val t = DistributedPrefix.scan(ranged, 0L,
      (a: Long, r: (Long, Long)) => a + r._2,
      (x: Long, y: Long) => x + y) {
      case (cb, (v, c)) => v * (c * cb + c * (c + 1) / 2)
    }.map(BigInt(_)).fold(BigInt(0))(_ + _)
    val num = 2 * t - BigInt(n + 1) * BigInt(sv)
    val den = BigInt(n) * BigInt(sv)
    Seq((n, sv, r6(num.toDouble / den.toDouble)))
      .toDF("n", "total_cents", "gini")
  }

  /** Benford expected first-digit probabilities, fixed to 10 dp so
    * the Spark query and the DuckDB oracle share VERBATIM literals
    * (the q206 CDF-threshold idiom) — no cross-engine log10. */
  private[graft] val benfordP: Map[Int, String] =
    (1 to 9).map(d => d -> BigDecimal(math.log10(1.0 + 1.0 / d))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toString).toMap

  /** Average-rank table over a (v: long) frame: one row per DISTINCT
    * value with r2 = 2·avg_rank = 2·C_before + c + 1 — the doubled
    * rank stays INTEGER through ties (.5 average ranks never touch a
    * float). Same grouped DistributedPrefix sweep as [[giniExact]];
    * the output is domain-sized, joined back to rows by value. */
  private[graft] def rankTable(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val grouped = df.groupBy("v").agg(count(lit(1)).as("c"))
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = grouped
      .repartitionByRange(parts, col("v").asc)
      .sortWithinPartitions("v")
      .as[(Long, Long)]
    DistributedPrefix.scan(ranged, 0L,
      (a: Long, r: (Long, Long)) => a + r._2,
      (x: Long, y: Long) => x + y) {
      case (cb, (v, c)) => (v, 2 * cb + c + 1)
    }.toDF("v", "r2")
  }

  /** Exact Spearman rank correlation over an (a: long, b: long) pair
    * frame: average ranks through the doubled-rank integer tables,
    * five BIGINT moment sums, then ONE driver-side BigInt combination
    * (n·Σab − Σa·Σb crosses 2^63 at sf0.1 — a Long multiply would
    * silently wrap) and one rounded double division. Split out so
    * StatOpsSpec pins the closures (monotone → 1, reversed → -1,
    * tie-heavy case against a hand formula). */
  private[graft] def spearmanExact(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    val p = pairs.localCheckpoint(true)
    // the two rank-table scans (each runs a DistributedPrefix action)
    // are independent chains over the checkpointed pairs — overlap
    // them (guide §2.6)
    val Seq(ra0, rb0) = graft.Util.inParallel(s, Seq(
      () => rankTable(p.select(col("a").as("v"))),
      () => rankTable(p.select(col("b").as("v")))))
    val ra = ra0.select(col("v").as("a"), col("r2").as("ra"))
    val rb = rb0.select(col("v").as("b"), col("r2").as("rb"))
    val m = p.join(ra, "a").join(rb, "b")
      .agg(count(lit(1)).as("n"), sum(col("ra")).as("sa"),
        sum(col("rb")).as("sb"),
        sum(col("ra") * col("ra")).as("saa"),
        sum(col("rb") * col("rb")).as("sbb"),
        sum(col("ra") * col("rb")).as("sab"))
      .head()
    val n = m.getLong(0)
    val Seq(sa, sb, saa, sbb, sab) =
      (1 to 5).map(i => BigInt(m.getLong(i)))
    val num = n * sab - sa * sb
    val denA = n * saa - sa * sa
    val denB = n * sbb - sb * sb
    val rho = r6(num.toDouble /
      (math.sqrt(denA.toDouble) * math.sqrt(denB.toDouble)))
    Seq((n, rho)).toDF("n", "rho")
  }

  /** Zero-filled daily count series over events: one row per calendar
    * day in [min_day, max_day] with t = day index and x = event
    * count. The day-grain series is bounded by the time span (never
    * by corpus size) — the heavy lifting is the ONE partial+final
    * count aggregate underneath. */
  private def dailySeries(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.load(s, d, "events")
      .select(to_date(col("ts")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("x"))
    val span = daily.agg(min("day").as("d0"), max("day").as("d1"))
    span.select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"), col("d0"))
      .join(daily, Seq("day"), "left")
      .na.fill(0L, Seq("x"))
      .select(datediff(col("day"), col("d0")).cast("long").as("t"),
        col("day"), col("x"))
  }

  /** CUSUM change point over a (t, day, x) series: deviations
    * dev_t = n·x_t − T (integer — n·mean never becomes a float),
    * cumulative S_t by DistributedPrefix in day order, split at
    * argmax |S_t| (earliest t breaks ties). Split out so StatOpsSpec
    * pins a planted level shift and the flat-series degenerate. */
  private[graft] def cusumSplit(series: DataFrame): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val ser = series.localCheckpoint(true)
    val tot = ser.agg(count(lit(1)).as("n"), sum("x").as("tx")).head()
    val (n, tx) = (tot.getLong(0), tot.getLong(1))
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = ser
      .select(col("t"), col("day").cast("string").as("day"), col("x"))
      .repartitionByRange(parts, col("t").asc)
      .sortWithinPartitions("t")
      .as[(Long, String, Long)]
    val cum = DistributedPrefix.scan(ranged, 0L,
      (a: Long, r: (Long, String, Long)) => a + (n * r._3 - tx),
      (x: Long, y: Long) => x + y) {
      case (before, (t, day, x)) => (t, day, x, before + (n * x - tx))
    }.toDF("t", "day", "x", "s")
    val top = cum.orderBy(abs(col("s")).desc, col("t").asc).limit(1)
      .head()
    val (split, splitDay, maxAbs) =
      (top.getAs[Long]("t"), top.getAs[String]("day"),
        math.abs(top.getAs[Long]("s")))
    val seg = ser.agg(
      sum(when(col("t") <= split, col("x"))).as("xb"),
      sum(when(col("t") > split, col("x"))).as("xa"),
      sum(when(col("t") > split, 1L).otherwise(0L)).as("na")).head()
    val (xb, xa, na) = (seg.getLong(0),
      if (seg.isNullAt(1)) 0L else seg.getLong(1), seg.getLong(2))
    val nb = n - na
    Seq((n, splitDay, maxAbs, nb, na, r6(xb.toDouble / nb),
      if (na == 0) 0.0 else r6(xa.toDouble / na)))
      .toDF("n_days", "split_day", "max_abs_s", "n_before", "n_after",
        "mean_before", "mean_after")
  }

  /** KMV (k-minimum-values) distinct sketch — the mergeable
    * fixed-size state the 100TB distinct-count layer is built from
    * (next to q82's HLL and q92's CMS, but EXACTLY reproducible:
    * deterministic md5 hashes, deterministic K smallest). The buffer
    * is a sorted ≤K-element array: map-side partial aggregation keeps
    * every executor's state at O(K) no matter the row volume, and
    * merge is "K smallest of the union" — associative, commutative,
    * and LOSSLESS for the final K-th value (every global top-K hash
    * survives any partial sketch it passes through, the invariant
    * KmvSpec pins and the q215 oracle proves cross-engine). */
  private[graft] class KmvSketchAgg(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(b: Array[Long], h: Long): Array[Long] =
      if (b.length < k || h < b.last) {
        if (java.util.Arrays.binarySearch(b, h) >= 0) b
        else ((b :+ h).sorted).take(k)
      } else b
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      (a ++ b).distinct.sorted.take(k)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Merge-side of [[KmvSketchAgg]]: folds already-built sketches
    * (the daily rollup → total path, q114's shape). */
  private[graft] class KmvMergeAgg(k: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val inner = new KmvSketchAgg(k)
    def zero: Array[Long] = inner.zero
    def reduce(b: Array[Long], s: Array[Long]): Array[Long] =
      inner.merge(b, s)
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** One inclusion-dependency candidate: is every distinct value of
    * dfA.ca present in dfB.cb? Distinct both domains, LEFT join,
    * count the misses — domain-sized work, never row-sized. */
  private[graft] def inclusionAudit(name: String, dfA: DataFrame,
      ca: String, dfB: DataFrame, cb: String): DataFrame = {
    val da = dfA.select(col(ca).cast("long").as("a")).distinct()
    val db = dfB.select(col(cb).cast("long").as("b")).distinct()
    da.join(db, col("a") === col("b"), "left")
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("b").isNull, 1L).otherwise(0L)).as("n_missing"))
      .select(lit(name).as("dep"), col("n_distinct"), col("n_missing"),
        (col("n_missing") === 0L).as("holds"))
  }

  /** q294's EWMA (α = 1/2) over the trailing-50-day daily count
    * series, EXACT: s₁ = c₁, sᵢ = (cᵢ + sᵢ₋₁)/2 has the closed form
    * sᵢ·2^(i−1) = c₁ + Σ_{j=2..i} cⱼ·2^(j−2), so one cumulative
    * DECIMAL sum of power-of-two-weighted counts replaces the
    * sequential recurrence — no driver loop, no float drift, and
    * the single-partition window is bounded by the CALENDAR (≤ 50
    * rows), never by data volume. The 50-day cap is principled:
    * older days carry EWMA weight < 2⁻⁵⁰ AND keep 2^(j−2) inside
    * DECIMAL(38). Forecast for day i is sᵢ₋₁; the abs error column
    * is the one-step-ahead backtest every capacity planner reads. */
  private[graft] def ewmaForecast(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.select(to_date(col("ts")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("cnt"))
    val horizon = daily.agg(max("day").as("mx"))
    val recent = daily.join(broadcast(horizon),
        col("day") > date_sub(col("mx"), 50))
      .drop("mx")
    val w = Window.partitionBy(lit(1)).orderBy("day")
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    recent
      .withColumn("rn", row_number().over(w))
      .withColumn("wt", when(col("rn") <= 2, lit(1).cast("decimal(20,0)"))
        .otherwise(expr("CAST(power(2, rn - 2) AS DECIMAL(20,0))")))
      .withColumn("t",
        sum(col("cnt").cast("decimal(12,0)") * col("wt")).over(cum))
      .withColumn("ewma_fp",
        when(col("rn") === 1, col("cnt") * 1000000L)
          .otherwise(expr(
            "(t * 1000000) div CAST(power(2, rn - 1) AS DECIMAL(20,0))")))
      .withColumn("forecast_fp", lag("ewma_fp", 1).over(w))
      .withColumn("abs_err_fp",
        abs(col("cnt") * 1000000L - col("forecast_fp")))
      .select("day", "cnt", "ewma_fp", "forecast_fp", "abs_err_fp")
      .orderBy("day")
  }

  /** q299's core over a (d: long) diff frame: zero diffs dropped,
    * |d| average-ranked through [[rankTable]]'s doubled-integer
    * table, W⁺/W⁻ exact, one final rounded normal approximation.
    * The doubled sums must tile n(n+1) exactly — a rank bug fails
    * loudly, not approximately. */
  private[graft] def wilcoxonSignedRank(diffs: DataFrame): DataFrame = {
    val s = diffs.sparkSession
    import s.implicits._
    val base = diffs.filter(col("d") =!= 0)
      .select(col("d"), abs(col("d")).as("v"))
      .localCheckpoint(true)
    val m = base.join(rankTable(base.select("v")), "v")
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") > 0, col("r2")).otherwise(0L)).as("w2p"),
        sum(when(col("d") < 0, col("r2")).otherwise(0L)).as("w2m"))
      .head()
    val (n, w2p, w2m) = (m.getLong(0), m.getLong(1), m.getLong(2))
    require(w2p + w2m == n * (n + 1),
      "doubled rank sums must cover n(n+1) exactly")
    val mu = n.toDouble * (n + 1) / 4.0
    val sigma = math.sqrt(n.toDouble * (n + 1) * (2 * n + 1) / 24.0)
    val z = math.rint((w2p / 2.0 - mu) / sigma * 1e6) / 1e6
    Seq((n, w2p, w2m, z)).toDF("n", "w2_plus", "w2_minus", "z")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EWMA daily-volume forecast with one-step-ahead backtest —
    // exact 2^j fixed-point algebra, calendar-bounded window; the
    // smoothing every ingestion-capacity dashboard runs.
    "q294_ewma_forecast" -> ((s, d) =>
      ewmaForecast(Tables.load(s, d, "events"))),

    // WILCOXON SIGNED-RANK — the paired-score significance test for
    // "did estimator B shift relative to A on the same docs":
    // whitespace token count vs the chars-div-5 length proxy, zero
    // diffs dropped per the standard procedure, |d| ranked through
    // the SAME doubled-average-rank integer table Spearman rides
    // (DistributedPrefix — no global window), W⁺/W⁻ kept as exact
    // doubled BIGINTs, one final rounded normal approximation.
    "q299_wilcoxon" -> ((s, d) =>
      wilcoxonSignedRank(Tables.load(s, d, "documents")
        .select((size(split(lower(trim(col("text"))), "\\s+"))
          .cast("long") - expr("n_chars div 5")).as("d")))),

    // McNEMAR'S TEST — the paired-classifier significance check a
    // pipeline runs before swapping quality filter A for B: both
    // filters judged against the reference label on the SAME docs,
    // so only the DISCORDANT counts b (A right, B wrong) and c
    // (A wrong, B right) matter. Exact integer contingency cells;
    // the continuity-corrected statistic (|b−c|−1)²/(b+c) is one
    // final rounded division. One scan, one tiny agg.
    "q296_mcnemar" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val toks = size(split(lower(trim(col("text"))), "\\s+"))
      val cells = docs.select(
        (col("lang") === "en").as("y"),
        (toks >= 40).as("a"),
        (col("n_chars") >= 200).as("b"))
        .select(
          (col("a") === col("y")).as("a_ok"),
          (col("b") === col("y")).as("b_ok"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("a_ok") && !col("b_ok"), 1L).otherwise(0L))
            .as("b_disc"),
          sum(when(!col("a_ok") && col("b_ok"), 1L).otherwise(0L))
            .as("c_disc"),
          sum(when(col("a_ok"), 1L).otherwise(0L)).as("a_correct"),
          sum(when(col("b_ok"), 1L).otherwise(0L)).as("b_correct"))
      cells.select(col("n"), col("a_correct"), col("b_correct"),
        col("b_disc"), col("c_disc"),
        round(col("a_correct").cast("double") / col("n"), 6)
          .as("acc_a"),
        round(col("b_correct").cast("double") / col("n"), 6)
          .as("acc_b"),
        when(col("b_disc") + col("c_disc") === 0, lit(null))
          .otherwise(round(
            pow(abs(col("b_disc") - col("c_disc")) - 1, 2)
              / (col("b_disc") + col("c_disc")), 6))
          .cast("double").as("chi2"))
    }),


    // GINI COEFFICIENT — the concentration audit (how skewed is
    // revenue across orders?) on exact integer cents. The textbook
    // formula needs every row's global rank; the global-window rank
    // is the scale-killer, so this is the grouped closed form over a
    // DistributedPrefix sweep of the DISTINCT amounts — same shape as
    // q187's AUC, one aggregate + one O(partitions) scan.
    "q209_gini" -> ((s, d) =>
      giniExact(Tables.load(s, d, "orders")
        .select(round(col("o_totalprice") * 100, 0).cast("long")
          .as("v")))),

    // BENFORD FIRST-DIGIT AUDIT — the fraud/synthetic-data smell
    // test: observed first-significant-digit counts of order amounts
    // vs Benford's log10(1+1/d) law, with the per-digit chi-square
    // contribution. The digit comes from the INTEGER cents rendered
    // as a string — no float log decides a bucket — and the expected
    // probabilities are fixed 10-dp literals shared with the oracle.
    // One partial+final aggregate over 9 groups.
    "q211_benford" -> ((s, d) => {
      val cents = Tables.load(s, d, "orders")
        .select(round(col("o_totalprice") * 100, 0).cast("long")
          .as("v"))
      val tot = cents.count().toDouble
      val pCol = (1 to 9).foldLeft(lit(0.0)) { (acc, dd) =>
        when(col("digit") === dd, lit(benfordP(dd).toDouble))
          .otherwise(acc)
      }
      cents
        .select(substring(col("v").cast("string"), 1, 1).cast("int")
          .as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        .withColumn("p_exp", pCol)
        .select(col("digit"), col("n_obs"),
          round(lit(tot) * col("p_exp"), 6).as("expected_n"),
          round((col("n_obs") - lit(tot) * col("p_exp"))
            * (col("n_obs") - lit(tot) * col("p_exp"))
            / (lit(tot) * col("p_exp")), 6).as("chi2_term"))
        .orderBy("digit")
    }),

    // SPEARMAN RANK CORRELATION — the monotone-association audit
    // (does quantity track price?) that Pearson gets wrong under
    // skew. Exact through ties: doubled average ranks stay integer,
    // five moment sums in one aggregate, one BigInt driver combine.
    // The quantity rank table is 50 rows (broadcasts); the price
    // rank table is domain-sized and equi-joins by value.
    "q210_spearman" -> ((s, d) =>
      spearmanExact(Tables.load(s, d, "lineitem")
        .select(round(col("l_quantity"), 0).cast("long").as("a"),
          round(col("l_extendedprice") * 100, 0).cast("long")
            .as("b")))),

    // AUTOCORRELATION FUNCTION — lag-1..7 ACF of the daily event
    // volume (the seasonality fingerprint: a weekly cadence shows as
    // a lag-7 peak). Textbook estimator r_k = Σ(x_t−x̄)(x_{t+k}−x̄)
    // / Σ(x_t−x̄)², cleared of the rational mean by n²: both sides
    // use dev_t = n·x_t − S, all BIGINT until the final divide. The
    // series is day-grain (span-bounded); pairs come from ONE
    // self-equi-join on t+k over an exploded 7-lag column.
    "q212_acf" -> ((s, d) => {
      val ser = dailySeries(s, d).localCheckpoint(true)
      val tot = ser.agg(count(lit(1)).as("n"), sum("x").as("sx"))
        .head()
      val (n, sx) = (tot.getLong(0), tot.getLong(1))
      val den = ser
        .agg(sum((col("x") * n - sx) * (col("x") * n - sx)))
        .head().getLong(0)
      val lagged = ser.select(col("t"), col("x"),
          explode(lit((1 to 7).map(_.toLong).toArray)).as("k"))
        .withColumn("tk", col("t") + col("k"))
      lagged.join(ser.select(col("t").as("tk"), col("x").as("xk")),
          Seq("tk"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("x") * n - sx) * (col("xk") * n - sx)).as("num"))
        .select(col("k"), col("n_pairs"),
          round(col("num").cast("double") / lit(den.toDouble), 6)
            .as("acf"))
        .orderBy("k")
    }),

    // CUSUM CHANGE POINT — where did the daily event level shift?
    // Cumulative sum of integer deviations n·x_t − T peaks at the
    // most likely split; the scan is a DistributedPrefix (the global
    // cumulative window this family always replaces), the argmax a
    // bounded TopN, the segment means one conditional aggregate.
    "q213_cusum" -> ((s, d) => cusumSplit(dailySeries(s, d))),

    // INCLUSION-DEPENDENCY AUDIT — the foreign-key discovery pass
    // (Metanome SPIDER-style, the sibling of q204's FD audit): six
    // candidates across the star schema, four true FKs, two planted
    // near-misses (p_size's domain outruns nation keys; customers
    // without orders break the reverse direction). Each candidate is
    // distinct-domain work: two partial-agg distincts and one LEFT
    // join on the value — never row-volume.
    "q214_inclusion_deps" -> ((s, d) => {
      val cust = Tables.load(s, d, "customer")
      val ord = Tables.load(s, d, "orders")
      val li = Tables.load(s, d, "lineitem")
      Seq(
        inclusionAudit("o_custkey<=c_custkey", ord, "o_custkey",
          cust, "c_custkey"),
        inclusionAudit("l_partkey<=p_partkey", li, "l_partkey",
          Tables.load(s, d, "part"), "p_partkey"),
        inclusionAudit("l_suppkey<=s_suppkey", li, "l_suppkey",
          Tables.load(s, d, "supplier"), "s_suppkey"),
        inclusionAudit("c_nationkey<=n_nationkey", cust, "c_nationkey",
          Tables.load(s, d, "nation"), "n_nationkey"),
        inclusionAudit("p_size<=n_nationkey",
          Tables.load(s, d, "part"), "p_size",
          Tables.load(s, d, "nation"), "n_nationkey"),
        inclusionAudit("c_custkey<=o_custkey", cust, "c_custkey",
          ord, "o_custkey")
      ).reduce(_ unionByName _)
    }),

    // KMV DISTINCT SKETCH — the exactly-reproducible member of the
    // mergeable-sketch tier (q82 HLL / q92 CMS are probabilistic
    // library state; KMV's "K smallest deterministic hashes" is
    // bit-checkable cross-engine). Built the ROLLUP way on purpose:
    // per-(type, day) sketches from a bounded-state typed Aggregator,
    // merged per type — the oracle computes the DIRECT global K-th
    // smallest, so a value match proves the merge lossless, not just
    // plausible. Estimate (K−1)·2³²/h_K lands within ~12% at K=64.
    "q215_kmv_distinct" -> ((s, d) => {
      val k = 64
      val kmv = udaf(new KmvSketchAgg(k))
      val kmvMerge = udaf(new KmvMergeAgg(k))
      val ev = Tables.load(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("user_id"))
      val hashed = ev.select(col("event_type"), col("day"),
        conv(substring(md5(concat(lit("kmv:"), col("user_id"))),
          1, 8), 16, 10).cast("long").as("h"))
      val daily = hashed.groupBy("event_type", "day")
        .agg(kmv(col("h")).as("sk"))
      val merged = daily.groupBy("event_type")
        .agg(kmvMerge(col("sk")).as("sk"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      merged.join(exact, "event_type")
        .select(col("event_type"), col("n_exact"),
          size(col("sk")).cast("long").as("sketch_m"),
          when(size(col("sk")) === k, element_at(col("sk"), k))
            .otherwise(0L).as("kth_h"))
        .withColumn("est",
          when(col("sketch_m") < k, col("sketch_m").cast("double"))
            .otherwise(round(lit((k - 1) * 4294967296.0)
              / col("kth_h"), 6)))
        .withColumn("rel_err",
          round(abs(col("est") - col("n_exact")) / col("n_exact"), 6))
        .orderBy("event_type")
    }),

    // MANN-KENDALL TREND TEST — the nonparametric drift gate for
    // daily pipeline volume (the monitoring twin of q180's KS test:
    // KS compares two samples, MK asks "is this series trending?").
    // S = Σ sgn(x_j − x_i) over day pairs with the exact tie-corrected
    // variance — all BIGINT; the pair join is day-grain (span², never
    // corpus²; beyond ~10⁴ days the rank formulation takes over).
    "q216_mann_kendall" -> ((s, d) => mannKendall(dailySeries(s, d))),

    // STRATIFIED SAMPLE with LARGEST-REMAINDER allocation — the
    // training-mixture primitive: a 20% budget split across language
    // strata proportionally, the floor shortfall distributed by
    // largest remainder (the seat-apportionment rule — exact, no
    // float quota), selection by deterministic md5 rank inside each
    // stratum. Allocation is driver-side over O(strata) counts; the
    // per-stratum rank window is partitioned by stratum (never a
    // global window); the checksum pins the EXACT sample, not just
    // its size.
    "q217_stratified_sample" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"))
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("nh"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1).toSeq
      val b = counts.map(_._2).sum / 5
      val alloc = largestRemainder(counts, b)
        .toDF("lang", "n_total", "n_alloc")
      val u = conv(substring(md5(concat(lit("ss:"), col("doc_id"))),
        1, 8), 16, 10).cast("long")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("u").asc, col("doc_id").asc)
      val sel = docs.withColumn("u", u)
        .withColumn("rk", row_number().over(w))
        .join(broadcast(alloc), "lang")
        .filter(col("rk") <= col("n_alloc"))
      // LEFT from alloc so a zero-allocation stratum still reports
      val selAgg = sel.groupBy("lang")
        .agg(count(lit(1)).as("n_sel"), sum("doc_id").as("sel_checksum"))
      alloc.join(selAgg, Seq("lang"), "left")
        .na.fill(0L, Seq("n_sel", "sel_checksum"))
        .select(col("lang"), col("n_total"), col("n_alloc"),
          col("n_sel"), col("sel_checksum"))
        .orderBy("lang")
    }),

    // DECISION STUMP by EXACT accuracy — the simplest trainable
    // model as a query: sweep every distinct price threshold, each
    // side predicts its majority class, pick the split maximizing
    // exact integer correct-count (accuracy, unlike Gini gain,
    // compares across thresholds without rational arithmetic). The
    // sweep is the q187/q209 shape: grouped distinct-value prefix
    // scan, then a bounded TopN argmax — never a per-row rank.
    "q218_decision_stump" -> ((s, d) =>
      decisionStump(Tables.load(s, d, "orders")
        .select(round(col("o_totalprice") * 100, 0).cast("long")
          .as("v"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L)
            .as("p")))),

    // CALIBRATION CURVE + ECE — the reliability diagram that audits a
    // model SCORE, the eval-tier complement of q218 (which audits a
    // model SPLIT): bin the predicted probability, compare each bin's
    // mean prediction to its observed positive rate, and weight the
    // gaps into the expected calibration error. Score = l_discount×10
    // (a stored per-row score in [0,1], spanning all ten deciles),
    // outcome = returned flag. All binning is integer (the score
    // rounds to integer PERCENT first, so no float ever decides a
    // bucket); per-bin rates are single divisions of exact integers;
    // ECE folds the ≤10 per-bin gaps rounded-to-8 through a DECIMAL
    // sum. One scan, one |bins|-keyed exchange, one scalar broadcast
    // back.
    "q229_calibration" -> ((s, d) =>
      calibrationCurve(Tables.load(s, d, "lineitem")
        .select(round(col("l_discount") * 1000, 0).cast("long")
          .as("pct"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L)
            .as("y")))),

    // HILL TAIL-INDEX ESTIMATOR (Hill 1975) — how heavy is the
    // document-length tail? α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the
    // top-k order statistics; small α means the 99.9th-percentile
    // doc dominates shard sizing and skew planning. The distributed
    // part is ONE TakeOrdered of k+1 values (k = 100, bounded); the
    // estimator folds rounded-to-8 ln terms through exact BigDecimal
    // on the driver (the q177 Zipf discipline). Also emitted: the
    // implied tail-halving ratio P(X>2t)/P(X>t) = 2^−α̂.
    "q237_hill_tail" -> ((s, d) =>
      hillTail(Tables.load(s, d, "documents")
        .select(length(col("text")).cast("long").as("x")), k = 100)),

    // EMBEDDING ANISOTROPY AUDIT — the representation-health check
    // (Ethayarajh 2019): the mean pairwise cosine over ALL n² vector
    // pairs, computed WITHOUT any pair join via the moment identity
    //   mean_{i≠j} cos(vᵢ,vⱼ) = (‖Σ v̂ᵢ‖² − n) / (n(n−1))
    // — one O(n·d) pass for an O(n²) statistic; at 100 TB this is
    // the difference between a scan and an impossible self-join.
    // Normalized components round to 8 and sum per dimension in
    // DECIMAL (order-exact); the norm² of the summed vector folds the
    // same way. Emitted globally and per label (within-class
    // anisotropy), each from the same single pass.
    "q238_anisotropy" -> ((s, d) => anisotropy(emb2(s, d))),

    // GROUPED EXACT LEAST SQUARES — per-source trend of document
    // length over arrival order, the drift detector that says WHICH
    // source is growing/shrinking its docs (q177's Zipf regression is
    // global and rank-based; this is per-group over raw ids). The
    // distributed part is ONE keyed agg of five integer moments
    // (n, Σx, Σy, Σxy, Σx²) carried in DECIMAL(38,0); the closed-form
    // slope/intercept algebra then runs on the |sources|-sized
    // collected frame in exact BigInt (the q177/q182 bounded-driver
    // discipline) — num/den never lose a bit, one double division
    // per coefficient at the end.
    "q232_group_trend" -> ((s, d) =>
      groupedOls(Tables.load(s, d, "documents")
        .select(col("source").as("g"), col("doc_id").as("x"),
          length(col("text")).cast("long").as("y")))),

    // GROUPED MEDIAN + MAD ROBUST OUTLIERS — the robust twin of
    // q167's z-scores (mean/stddev break under the heavy tails
    // crawl-length distributions actually have): per source, exact
    // nearest-rank median, exact MAD (median of |x−med|), and the
    // |x−med| > 5·MAD outlier census — every statistic an integer, so
    // the oracle matches bit-exact. The selection never sorts rows:
    // both medians run on the (group × distinct value) table (the
    // q163 rank-selection shape) with a group-partitioned cumulative
    // window, and the per-row passes are broadcast-joined against the
    // |sources|-row med/mad tables.
    "q233_mad_outliers" -> ((s, d) =>
      groupedMadOutliers(Tables.load(s, d, "documents")
        .select(col("source").as("g"),
          length(col("text")).cast("long").as("x")), thr = 5)),

    // KMV SET OPERATIONS — overlap estimation between two corpus
    // snapshots WITHOUT joining them (Beyer et al., K-min synopses):
    // the 100TB story is comparing yesterday's and today's key sets
    // from two K-element sketches instead of a cross-snapshot
    // shuffle. Sides = distinct order keys shipping in 1996 vs 1997
    // (Jaccard ≈ 0.29 — a real partial overlap). Union sketch = K
    // smallest of the merged sketches (valid since h_K(A∪B) ≤ both
    // h_K's, so membership of every union-sketch hash is decidable
    // from the side sketches); ρ/K estimates Jaccard. The oracle
    // recomputes the sketches DIRECTLY from the full domains plus the
    // exact overlap census, so a value match proves the distributed
    // sketch path AND the estimator algebra, not just one of them.
    "q219_kmv_setops" -> ((s, d) => {
      import s.implicits._
      val k = 256
      val kmv = udaf(new KmvSketchAgg(k))
      def keys(y: Int) = Tables.load(s, d, "lineitem")
        .filter(year(col("l_shipdate")) === y)
        .select(col("l_orderkey").as("kk")).distinct()
        .localCheckpoint(true)
      val (a, b) = (keys(1996), keys(1997))
      val h = conv(substring(md5(concat(lit("kso:"), col("kk"))),
        1, 12), 16, 10).cast("long")
      def sketch(df: DataFrame): Array[Long] = df.select(h.as("h"))
        .agg(kmv(col("h"))).head().getSeq[Long](0).toArray
      val (ska, skb) = (sketch(a), sketch(b))
      val (nA, nB) = (a.count(), b.count())
      val nInter = a.join(b, "kk").count()
      val nUnion = nA + nB - nInter
      val (_, rho, estU, estI) = kmvSetAlgebra(ska, skb, k)
      Seq((nA, nB, nInter, r6(nInter.toDouble / nUnion),
        kmvEst(ska, k), kmvEst(skb, k), estU, rho, estI,
        r6(rho.toDouble / k),
        r6(math.abs(estU - nUnion) / nUnion)))
        .toDF("n_a", "n_b", "n_inter", "jaccard_exact", "est_a",
          "est_b", "est_union", "rho", "est_inter", "jaccard_est",
          "rel_err_union")
    }),

    // JOIN-SIZE FORECAST — the shuffle you didn't pay for: exact
    // output cardinality + skew profile of three joins from their key
    // histograms alone (Σ aₖ·bₖ), never materializing a single output
    // row. The three shapes are the planner's textbook cases: a
    // benign PK-FK join (expansion ≈ 1), a per-user self-join whose
    // output grows QUADRATICALLY in events-per-user (the
    // sessionization trap), and a low-cardinality self-join that
    // explodes 4+ orders of magnitude (the accidental-key trap).
    // top_share_ppm is integer parts-per-million — no float decides
    // the skew ranking.
    "q220_join_forecast" -> ((s, d) => {
      import s.implicits._
      // three INDEPENDENT forecast chains (each ~7 sequential scalar
      // jobs) — overlap them from a driver pool (guide §2.6)
      val rows = graft.Util.inParallel(s, Seq(
        () => joinForecast("orders*lineitem@orderkey",
          Tables.load(s, d, "orders")
            .select(col("o_orderkey").cast("string").as("k")),
          Tables.load(s, d, "lineitem")
            .select(col("l_orderkey").cast("string").as("k"))),
        () => joinForecast("events*events@user_id",
          Tables.load(s, d, "events")
            .select(col("user_id").cast("string").as("k")),
          Tables.load(s, d, "events")
            .select(col("user_id").cast("string").as("k"))),
        () => joinForecast("documents*documents@lang",
          Tables.load(s, d, "documents").select(col("lang").as("k")),
          Tables.load(s, d, "documents").select(col("lang").as("k")))))
      rows.toDF("join_name", "n_left", "n_right", "keys_left",
        "keys_right", "keys_matching", "out_rows", "top_key",
        "top_key_out", "top_share_ppm", "expansion")
    }),

    // QUANTILE NORMALIZATION — the cross-source score-calibration
    // pass (quality scores from heterogeneous sources aren't
    // comparable; their QUANTILES are): each doc's within-source rank
    // maps to the global value at the same nearest-rank quantile,
    // p = ceil(r·N/n_s), all integer. The global order never
    // materializes as a per-row sort: it lives in the domain-sized
    // cumulative table whose (lo, hi) position intervals explode to
    // an N-row position→value table, making the final lookup a plain
    // EQUI-join (no range join, no global window). The per-source
    // rank window partitions by source.
    "q221_quantile_norm" -> ((s, d) =>
      quantileNormalize(Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars")))),

    // WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis
    // A-ES, VLDB 2006): sample 20 documents with probability
    // proportional to n_chars in ONE distributed pass — per doc a
    // uniform u from its 48-bit md5 key, score ln(u)/w (the log of
    // the classic u^(1/w): monotone-equivalent and underflow-free),
    // TakeOrdered top-20 by (score desc, doc_id). The ln rounds to
    // 9dp BEFORE ranking so both engines order the same list (the
    // q237 ln discipline); heavier docs need exponentially less luck
    // — the size-biased pick a token-budget sampler actually wants,
    // with no global shuffle and no per-partition reservoir state.
    "q246_weighted_sample" -> ((s, d) => {
      val u = (conv(substring(md5(concat(lit("ws:"),
        col("doc_id").cast("string"))), 1, 12), 16, 10).cast("double")
        + lit(1.0)) / lit(281474976710657.0)
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          round(log(u) / col("n_chars"), 9).as("skey"))
        .orderBy(col("skey").desc, col("doc_id").asc).limit(20)
    })
  )

  /** q221's exact nearest-rank quantile normalization over a
    * (doc_id, source, n_chars) frame: within-source rank r (total
    * (n_chars, doc_id) tiebreak) maps to the global value at position
    * p = ceil(r·N/n_s). The global order never materializes per row:
    * the domain-sized cumulative table's (lo, hi] intervals explode
    * to an N-row position→value table and the lookup is an equi-join.
    * Split out so StatOpsSpec pins the hand mapping and the
    * equal-size closure (each source's normalized multiset == the
    * global multiset restricted to its quantile grid). */
  private[graft] def quantileNormalize(docs0: DataFrame): DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
    val docs = docs0.localCheckpoint(true)
    val n = docs.count()
    val ns = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val rk = docs
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .join(broadcast(ns), "source")
      .withColumn("global_pos",
        expr(s"(src_rank * $n + n_s - 1) DIV n_s"))
    val g = docs.groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = g.repartitionByRange(parts, col("v").asc)
      .sortWithinPartitions("v").as[(Long, Long)]
    val cum = DistributedPrefix.scan(ranged, 0L,
      (a: Long, r: (Long, Long)) => a + r._2,
      (x: Long, y: Long) => x + y) {
      case (cb, (v, c)) => (v, cb, c)
    }.toDF("v", "cb", "c")
    val pv = cum.select(col("v").as("normalized"),
      explode(sequence(col("cb") + 1, col("cb") + col("c")))
        .as("global_pos"))
    rk.join(pv, "global_pos")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("src_rank"), col("global_pos"), col("normalized"))
  }

  /** q217's largest-remainder (Hamilton) apportionment: split budget
    * b across strata proportionally to their counts — integer floors
    * first, the shortfall to the largest fractional remainders
    * (stratum name breaks remainder ties). Exactly sums to b and
    * never exceeds a stratum's population when b ≤ Σcounts. Split
    * out so StatOpsSpec pins those two invariants plus a hand case. */
  private[graft] def largestRemainder(counts: Seq[(String, Long)],
      b: Long): Seq[(String, Long, Long)] = {
    val n = counts.map(_._2).sum
    val base = counts.map { case (l, nh) =>
      (l, nh, b * nh / n, b * nh % n) }
    val leftover = (b - base.map(_._3).sum).toInt
    val bump = base.sortBy { case (l, _, _, rem) => (-rem, l) }
      .take(leftover).map(_._1).toSet
    base.map { case (l, nh, bs, _) =>
      (l, nh, bs + (if (bump(l)) 1L else 0L)) }
  }

  /** q219's KMV set algebra over two driver-side sketches (sorted
    * ≤K arrays of distinct 48-bit hashes). The union sketch is the K
    * smallest of the merged arrays — valid because h_K(A∪B) ≤
    * min(h_K(A), h_K(B)), so every union-sketch member's presence in
    * A or B is DECIDABLE from the A/B sketches alone (the Beyer et
    * al. K-min synopses result). ρ = members of the union sketch
    * present in both sides; est_jaccard = ρ/K, est_inter = ρ/K ·
    * est_union. Driver-side O(K); split out so StatOpsSpec pins the
    * saturated-K exactness (K ≥ |domain| ⇒ every estimate exact) and
    * a planted half-overlap. */
  private[graft] def kmvSetAlgebra(ska: Array[Long], skb: Array[Long],
      k: Int): (Array[Long], Long, Double, Double) = {
    val union = (ska ++ skb).distinct.sorted.take(k)
    val (sa, sb) = (ska.toSet, skb.toSet)
    val rho = union.count(h => sa(h) && sb(h)).toLong
    val estU =
      if (union.length < k) union.length.toDouble
      else r6((k - 1) * 281474976710656.0 / union.last)
    (union, rho, estU, r6(rho.toDouble * estU / k))
  }

  /** One side's KMV estimate — mirrors q215's (K−1)·2⁴⁸/h_K with the
    * under-K exact fallback. */
  private[graft] def kmvEst(sk: Array[Long], k: Int): Double =
    if (sk.length < k) sk.length.toDouble
    else r6((k - 1) * 281474976710656.0 / sk.last)

  /** q220's single-join forecast: exact output size and skew profile
    * of an equi-join WITHOUT executing it — Σ aₖ·bₖ over the two key
    * HISTOGRAMS (domain-sized), the top key by contribution a bounded
    * TopN. This is the planning pass AQE runs from runtime stats,
    * expressed as a query: at 100 TB you buy the O(keys) census
    * before paying for the O(output) shuffle. Sides arrive as single
    * string column `k`; self-joins pass the same frame twice. */
  private[graft] def joinForecast(name: String, left: DataFrame,
      right: DataFrame): (String, Long, Long, Long, Long, Long, Long,
      Option[String], Option[Long], Option[Long], Double) = {
    // counts ride DECIMAL(19,0) so the aₖ·bₖ products and their sum
    // are exact (38,0) — Spark Long multiplication wraps silently in
    // non-ANSI mode while the oracle's HUGEINT promotes; at a
    // low-cardinality self-join scale (~3M rows/key) they'd diverge
    val ha = left.groupBy("k")
      .agg(count(lit(1)).cast("decimal(19,0)").as("a"))
      .localCheckpoint(true)
    val hb = right.groupBy("k")
      .agg(count(lit(1)).cast("decimal(19,0)").as("b"))
      .localCheckpoint(true)
    val sa = ha.agg(sum("a"), count(lit(1))).head()
    val sb = hb.agg(sum("b"), count(lit(1))).head()
    def biOf(r: org.apache.spark.sql.Row, i: Int): BigInt =
      if (r.isNullAt(i)) BigInt(0) else BigInt(r.getDecimal(i).toBigInteger)
    val (nL, kL) = (biOf(sa, 0).toLong, sa.getLong(1))
    val (nR, kR) = (biOf(sb, 0).toLong, sb.getLong(1))
    val m = ha.join(hb, "k")
      .select(col("k"), (col("a") * col("b")).as("ab"))
      .localCheckpoint(true)
    val t = m.agg(count(lit(1)), sum("ab")).head()
    val (kM, out) = (t.getLong(0), biOf(t, 1))
    // a join pair sharing no keys has no top key: NULLs, never a
    // head() throw or a divide-by-zero — the oracle's convention
    val top = m.orderBy(col("ab").desc, col("k").asc).limit(1)
      .collect().headOption
    top match {
      case Some(r) =>
        val topAb = BigInt(r.getDecimal(1).toBigInteger)
        val share = topAb * 1000000 / out
        // loud overflow, mirroring the oracle: DuckDB's HUGEINT→BIGINT
        // cast raises; an unguarded .toLong here would wrap silently
        // and diverge at extreme key skew instead of failing
        require(out.isValidLong && topAb.isValidLong && share.isValidLong,
          s"joinForecast($name): forecast exceeds BIGINT (out=$out)")
        (name, nL, nR, kL, kR, kM, out.toLong, Some(r.getString(0)),
          Some(topAb.toLong), Some(share.toLong),
          r6(out.toDouble / math.max(nL, nR)))
      case None =>
        (name, nL, nR, kL, kR, 0L, 0L, None, None, None, 0.0)
    }
  }

  /** q218's threshold sweep over a (v: long, p: 0/1 long) frame:
    * inclusive prefix (n_left, pos_left) per distinct v via
    * DistributedPrefix, correct(t) = best-majority on both sides,
    * argmax by (correct desc, t asc). Split out so StatOpsSpec pins
    * a perfectly separable split and the all-one-class degenerate. */
  private def emb2(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings").select(col("label"),
      col("embedding").cast("array<double>").as("v"))

  /** q237's Hill estimator over an (x: long) frame: top-(k+1) order
    * statistics via one TakeOrdered, rounded-ln fold in exact
    * BigDecimal on the driver. Degenerate (fewer than k+1 rows,
    * non-positive threshold, or a zero ln-sum — all top values equal
    * the threshold) is flagged, never a NaN. StatOpsSpec pins the
    * closed form on an exact-Pareto fixture and the degenerate
    * corners. */
  private[graft] def hillTail(vals: DataFrame, k: Int): DataFrame = {
    val s = vals.sparkSession
    import s.implicits._
    val top = vals.orderBy(col("x").desc).limit(k + 1)
      .collect().map(_.getLong(0))
    val n = vals.count()
    def r8(v: Double) = BigDecimal(v)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val out =
      if (top.length < k + 1 || top(k) <= 0L)
        (n, k.toLong, if (top.length > k) top(k) else 0L, 0.0, 0.0,
          true)
      else {
        val thr = top(k)
        val sumLn = top.take(k)
          .map(x => r8(math.log(x.toDouble / thr.toDouble))).sum
        if (sumLn.signum == 0) (n, k.toLong, thr, 0.0, 0.0, true)
        else {
          val alpha = k.toDouble / sumLn.toDouble
          (n, k.toLong, thr, r6(alpha), r6(math.pow(2.0, -alpha)),
            false)
        }
      }
    Seq(out).toDF("n", "k", "x_threshold", "alpha", "tail_halving",
      "degenerate")
  }

  /** q238's anisotropy audit over a (label, v: array<double>) frame:
    * mean pairwise cosine over all ordered pairs i ≠ j via the moment
    * identity ‖Σû‖² − Σ‖ûᵢ‖², one O(n·d) pass, no pair join. Each
    * normalized component is fixed to the integer round(x/‖v‖·1e8)
    * in BOTH engines, so every cross-row sum is exact integer
    * algebra (per-dimension sums and per-row square sums ride
    * DECIMAL(38,0); the norm² of the summed vector folds in BigInt on
    * the |labels|·dim collected frame). Zero vectors contribute zero
    * dot products and are counted. StatOpsSpec pins the identity
    * against a brute pairwise loop and the closed forms (identical
    * vectors → 1, an orthogonal pair → 0). */
  private[graft] def anisotropy(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val nrm = sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x))
    val m = when(nrm === 0.0, transform(col("v"), _ => lit(0L)))
      .otherwise(transform(col("v"),
        x => round(x / nrm * lit(1e8), 0).cast("long")))
    val staged = e.select(col("label"), m.as("m")).cache()
    val rowStats = staged.select(col("label"),
        aggregate(col("m"), lit(0L), (a, x) => a + x * x)
          .cast("decimal(38,0)").as("q"))
      .groupBy("label")
      .agg(count(lit(1)).as("nl"), sum("q").as("ql")).collect()
    val dimSums = staged
      .select(col("label"), posexplode(col("m")).as(Seq("pos", "mx")))
      .groupBy("label", "pos")
      .agg(sum(col("mx").cast("decimal(38,0)")).as("sl")).collect()
    staged.unpersist()
    def bi(d: java.math.BigDecimal) = BigInt(d.toBigInteger)
    val byLabel = dimSums.groupBy(_.getInt(0))
    val perLabel = rowStats.map { r =>
      val lab = r.getInt(0)
      val nl = r.getLong(1)
      val ql = bi(r.getDecimal(2))
      // a label whose vectors are ALL empty arrays appears in rowStats
      // but posexplode yields no dimSums rows for it — its per-dim
      // sums are an all-zero vector, not a lookup failure
      val sums = byLabel.getOrElse(lab,
          Array.empty[org.apache.spark.sql.Row])
        .map(x => bi(x.getDecimal(2)))
      val normSq = sums.map(v => v * v).sum
      (lab, nl, ql, normSq)
    }.sortBy(_._1)
    // global: per-dimension sums add across labels; Σ‖û‖² adds too
    val gN = perLabel.map(_._2).sum
    val gQ = perLabel.map(_._3).sum
    val gDim = dimSums.groupBy(_.getInt(1)).values
      .map(rs => rs.map(x => bi(x.getDecimal(2))).sum)
    val gNormSq = gDim.map(v => v * v).sum
    def mean(normSq: BigInt, q: BigInt, cnt: Long): Double =
      if (cnt < 2) 0.0
      else r6((normSq - q).toDouble /
        (cnt.toDouble * (cnt - 1).toDouble) / 1e16)
    val rows = perLabel.map { case (lab, nl, ql, nsq) =>
      (lab, nl, mean(nsq, ql, nl)) }.toSeq :+
      ((-1, gN, mean(gNormSq, gQ, gN)))
    rows.toDF("scope_label", "n_vecs", "mean_pairwise_cos")
      .orderBy("scope_label")
  }

  /** q232's per-group exact OLS over a (g, x: long, y: long) frame:
    * one keyed agg of integer moments in DECIMAL(38,0), closed-form
    * slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and intercept =
    * (Σy·den − num·Σx)/(n·den) evaluated in exact BigInt on the
    * collected |groups|-sized frame. den = 0 (constant x) yields
    * zero slope/intercept with a flag, never a NaN. StatOpsSpec pins
    * exact lines, shift invariance of the slope, and the den = 0
    * guard. */
  private[graft] def groupedOls(pts: DataFrame): DataFrame = {
    val s = pts.sparkSession
    import s.implicits._
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val moments = pts.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
      sum(d38(col("x")) * d38(col("y"))).as("sxy"),
      sum(d38(col("x")) * d38(col("x")))
        .as("sxx")).collect()
    def r8(v: Double) = BigDecimal(v)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = moments.map { r =>
      val n = BigInt(r.getLong(1))
      def bi(i: Int) = BigInt(r.getDecimal(i).toBigInteger)
      val (sx, sy, sxy, sxx) = (bi(2), bi(3), bi(4), bi(5))
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      if (den == 0)
        (r.getString(0), r.getLong(1), 0.0, 0.0, true)
      else
        (r.getString(0), r.getLong(1),
          r8(num.toDouble / den.toDouble),
          r6((sy * den - num * sx).toDouble / (n * den).toDouble),
          false)
    }
    rows.toSeq.toDF("source", "n", "slope", "intercept", "degenerate")
      .orderBy("source")
  }

  /** Exact nearest-rank grouped median over a (g, x: long) frame —
    * rank ⌈n/2⌉ = (n+1) DIV 2, the lower median. Selection runs on
    * the (g × distinct x) table with a group-partitioned cumulative
    * window (bounded by the value domain, never the row count). */
  private def groupedMedian(vals: DataFrame): DataFrame = {
    val grp = vals.groupBy("g", "x").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("x")
    val tot = vals.groupBy("g").agg(count(lit(1)).as("n"))
    grp.withColumn("cum", sum("c").over(w))
      .join(tot, "g")
      .filter(col("cum") >= expr("(n + 1) DIV 2"))
      .groupBy("g").agg(min("x").as("med"))
  }

  /** q233's robust-outlier census over a (g, x: long) frame: per
    * group, n, exact median, exact MAD, and the count of rows with
    * |x − med| > thr·MAD. All integers; two rank selections + two
    * broadcast joins of |groups|-row tables. StatOpsSpec pins the
    * hand-computed closed forms including the even-count lower-median
    * convention and the MAD = 0 (constant group) corner. */
  private[graft] def groupedMadOutliers(vals: DataFrame, thr: Int)
      : DataFrame = {
    val meds = broadcast(groupedMedian(vals))
    val dev = vals.join(meds, "g")
      .select(col("g"), abs(col("x") - col("med")).as("x"))
    val mads = broadcast(groupedMedian(dev)
      .select(col("g"), col("med").as("mad")))
    vals.join(meds, "g").join(mads, "g")
      .groupBy(col("g").as("source"))
      .agg(count(lit(1)).as("n"), min("med").as("median"),
        min("mad").as("mad"),
        sum(when(abs(col("x") - col("med")) >
          lit(thr.toLong) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("source")
  }

  /** q229's reliability diagram over a (pct: 0..100 long, y: 0/1
    * long) frame: decile bins on the integer percent score (bin 9
    * also absorbs pct = 100), per-bin mean prediction Σpct/(100·n)
    * vs observed rate pos/n, |gap|, and the global ECE
    * Σ n_b·|gap_b| / N repeated on every row. StatOpsSpec pins the
    * closed forms: a perfectly calibrated frame has ECE 0; a
    * constant-score frame collapses to one bin whose gap IS the
    * ECE. */
  private[graft] def calibrationCurve(scored: DataFrame): DataFrame = {
    val bins = scored
      .groupBy(least(expr("pct DIV 10"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum("y").as("pos"),
        sum("pct").as("sp"))
    val rated = bins.select(col("bin"), col("n"), col("pos"),
        (col("sp").cast("double") / col("n").cast("double") /
          lit(100.0)).as("pred"),
        (col("pos").cast("double") / col("n").cast("double"))
          .as("obs"))
      .withColumn("gap8",
        round(abs(col("obs") - col("pred")), 8)
          .cast("decimal(20,8)"))
      .localCheckpoint(true) // <= 10 rows; feeds the ECE and the output
    val tot = rated
      .agg(sum(col("gap8") * col("n")).as("wg"), sum("n").as("nn"))
      .head()
    val ece = BigDecimal(tot.getDecimal(0))
      .toDouble / tot.getLong(1).toDouble
    rated.select(col("bin"), col("n"), col("pos"),
        round(col("pred"), 6).as("pred_mean"),
        round(col("obs"), 6).as("obs_rate"),
        round(col("gap8").cast("double"), 6).as("abs_gap"),
        lit(r6(ece)).as("ece"))
      .orderBy("bin")
  }

  private[graft] def decisionStump(labeled: DataFrame): DataFrame = {
    val s = labeled.sparkSession
    import s.implicits._
    val g = labeled.groupBy("v")
      .agg(count(lit(1)).as("c"), sum("p").as("pos"))
    val tot = g.agg(sum("c"), sum("pos")).head()
    val (n, pp) = (tot.getLong(0), tot.getLong(1))
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = g.repartitionByRange(parts, col("v").asc)
      .sortWithinPartitions("v")
      .as[(Long, Long, Long)]
    val scored = DistributedPrefix.scan(ranged, (0L, 0L),
      (a: (Long, Long), r: (Long, Long, Long)) =>
        (a._1 + r._2, a._2 + r._3),
      (x: (Long, Long), y: (Long, Long)) =>
        (x._1 + y._1, x._2 + y._2)) {
      case ((cb, pb), (v, c, pos)) =>
        val (nl, pl) = (cb + c, pb + pos)
        val correct = math.max(pl, nl - pl) +
          math.max(pp - pl, (n - nl) - (pp - pl))
        (v, correct)
    }.toDF("threshold", "n_correct")
    val best = scored
      .orderBy(col("n_correct").desc, col("threshold").asc).limit(1)
      .head()
    val (t, correct) =
      (best.getAs[Long]("threshold"), best.getAs[Long]("n_correct"))
    val maj = math.max(pp, n - pp)
    Seq((t, n, correct, r6(correct.toDouble / n), maj,
      r6((correct - maj).toDouble / n)))
      .toDF("threshold", "n", "n_correct", "accuracy",
        "majority_correct", "gain")
  }

  /** Mann-Kendall core over a (t, x) series frame — integer S over
    * the t-ordered pair join, exact tie-corrected variance, one
    * rounded z. Split out so StatOpsSpec pins hand-walked series
    * (short monotone below the 1.96 gate, long monotone above it,
    * all-tied → S = 0, z = 0). */
  private[graft] def mannKendall(series: DataFrame): DataFrame = {
    val s = series.sparkSession
    import s.implicits._
    val ser = series.localCheckpoint(true)
    val n = ser.count()
    val sStat = ser.as("a")
      .join(ser.as("b"), col("b.t") > col("a.t"))
      .agg(sum(when(col("b.x") > col("a.x"), 1L)
        .when(col("b.x") < col("a.x"), -1L).otherwise(0L)).as("s"))
      .head().getLong(0)
    val tieRow = ser.groupBy("x").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) * (2 * c + 5)"))).head()
    val tt = if (tieRow.isNullAt(0)) 0L else tieRow.getLong(0)
    val var18 = n * (n - 1) * (2 * n + 5) - tt
    val z =
      if (sStat > 0) r6((sStat - 1).toDouble
        / math.sqrt(var18.toDouble / 18.0))
      else if (sStat < 0) r6((sStat + 1).toDouble
        / math.sqrt(var18.toDouble / 18.0))
      else 0.0
    val trend = if (z > 1.96) "increasing"
      else if (z < -1.96) "decreasing" else "no_trend"
    Seq((n, sStat, var18, z, trend))
      .toDF("n_days", "s_stat", "var18", "z", "trend")
  }

  def oracles: Map[String, String] = Map(
    // q294: identical closed form — HUGEINT power-of-two weights,
    // one cumulative sum, floor division back to 1e6 fixed point
    "q294_ewma_forecast" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT day, cnt FROM d
        |  WHERE day > (SELECT max(day) FROM d) - 50
        |), rw AS (
        |  SELECT day, cnt, row_number() OVER (ORDER BY day) AS rn
        |  FROM r
        |), s AS (
        |  SELECT day, cnt, rn,
        |    sum(cnt::HUGEINT * CASE WHEN rn <= 2 THEN 1::HUGEINT
        |        ELSE power(2, rn - 2)::HUGEINT END)
        |      OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t
        |  FROM rw
        |), e AS (
        |  SELECT day, cnt,
        |    CASE WHEN rn = 1 THEN cnt * 1000000
        |      ELSE ((t * 1000000) // power(2, rn - 1)::HUGEINT)::BIGINT
        |      END AS ewma_fp
        |  FROM s
        |)
        |SELECT day, cnt, ewma_fp,
        |  lag(ewma_fp) OVER (ORDER BY day) AS forecast_fp,
        |  abs(cnt * 1000000
        |    - lag(ewma_fp) OVER (ORDER BY day)) AS abs_err_fp
        |FROM e ORDER BY day""".stripMargin,

    // q299: identical doubled-rank algebra in window SQL, identical
    // final normal approximation
    "q299_wilcoxon" ->
      """WITH dd AS (
        |  SELECT len(string_split_regex(lower(trim(text)), '\s+'))
        |    ::BIGINT - n_chars // 5 AS d
        |  FROM documents
        |), nz AS (SELECT d, abs(d) AS v FROM dd WHERE d <> 0),
        |g AS (SELECT v, count(*)::BIGINT AS c FROM nz GROUP BY v),
        |r AS (
        |  SELECT v, 2 * (sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        |    + c + 1 AS r2
        |  FROM g
        |), j AS (SELECT nz.d, r.r2 FROM nz JOIN r USING (v)),
        |agg AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT)
        |      AS w2p,
        |    CAST(sum(CASE WHEN d < 0 THEN r2 ELSE 0 END) AS BIGINT)
        |      AS w2m
        |  FROM j
        |)
        |SELECT n, w2p AS w2_plus, w2m AS w2_minus,
        |  round((w2p / 2.0 - n * (n + 1) / 4.0)
        |    / sqrt(n * (n + 1) * (2 * n + 1) / 24.0), 6) AS z
        |FROM agg""".stripMargin,

    // q296: the same two rules, the same discordant cells, the same
    // continuity-corrected statistic
    "q296_mcnemar" ->
      """WITH j AS (
        |  SELECT (lang = 'en') AS y,
        |    len(string_split_regex(lower(trim(text)), '\s+')) >= 40
        |      AS a,
        |    n_chars >= 200 AS b
        |  FROM documents
        |), k AS (
        |  SELECT (a = y) AS a_ok, (b = y) AS b_ok FROM j
        |), c AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(sum(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b_disc,
        |    CAST(sum(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c_disc,
        |    CAST(sum(CASE WHEN a_ok THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a_correct,
        |    CAST(sum(CASE WHEN b_ok THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b_correct
        |  FROM k
        |)
        |SELECT n, a_correct, b_correct, b_disc, c_disc,
        |  round(a_correct::DOUBLE / n, 6) AS acc_a,
        |  round(b_correct::DOUBLE / n, 6) AS acc_b,
        |  CASE WHEN b_disc + c_disc = 0 THEN NULL
        |    ELSE round(power(abs(b_disc - c_disc) - 1, 2)::DOUBLE
        |      / (b_disc + c_disc), 6) END AS chi2
        |FROM c""".stripMargin,


    // same grouped closed form; the exclusive cumulative count runs
    // over DISTINCT v — a total order, so the window is deterministic
    "q209_gini" ->
      """WITH g AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1
        |), p AS (
        |  SELECT v, c,
        |    coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cb
        |  FROM g
        |), t AS (
        |  SELECT sum(v * (c * cb + c * (c + 1) // 2)) AS ti,
        |    sum(c) AS n, sum(v * c) AS sv
        |  FROM p
        |)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sv AS BIGINT)
        |    AS total_cents,
        |  round((2 * ti - (n + 1) * sv)::DOUBLE
        |    / ((n * sv)::DOUBLE), 6) AS gini
        |FROM t""".stripMargin,

    // same string-rendered first digit and shared 10-dp literals
    "q211_benford" -> {
      val pCase = (1 to 9)
        .map(d => s"WHEN $d THEN ${benfordP(d)}")
        .mkString(" ")
      s"""WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
), tot AS (SELECT count(*)::DOUBLE AS n FROM cents),
dg AS (
  SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
    CAST(count(*) AS BIGINT) AS n_obs
  FROM cents GROUP BY 1
)
SELECT digit, n_obs,
  round(n * p, 6) AS expected_n,
  round((n_obs - n * p) * (n_obs - n * p) / (n * p), 6) AS chi2_term
FROM (SELECT digit, n_obs, CASE digit $pCase END AS p FROM dg), tot
ORDER BY digit"""
    },

    // same doubled-average-rank algebra; rank() + per-value count
    // reproduce 2r = 2·C_before + c + 1 deterministically through ties
    "q210_spearman" ->
      """WITH p AS MATERIALIZED (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS a,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS b
        |  FROM lineitem
        |), rr AS (
        |  SELECT
        |    2 * rank() OVER (ORDER BY a)
        |      + count(*) OVER (PARTITION BY a) - 1 AS ra,
        |    2 * rank() OVER (ORDER BY b)
        |      + count(*) OVER (PARTITION BY b) - 1 AS rb
        |  FROM p
        |), m AS (
        |  SELECT count(*) AS n, sum(ra) AS sa, sum(rb) AS sb,
        |    sum(ra * ra) AS saa, sum(rb * rb) AS sbb,
        |    sum(ra * rb) AS sab
        |  FROM rr
        |)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((n * sab - sa * sb)::DOUBLE
        |    / (sqrt((n * saa - sa * sa)::DOUBLE)
        |       * sqrt((n * sbb - sb * sb)::DOUBLE)), 6) AS rho
        |FROM m""".stripMargin,

    // same n-cleared integer deviations over the same zero-filled
    // calendar; one self-join per lag
    "q212_acf" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1
        |), span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |cal AS (
        |  SELECT unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS day, d0 FROM span
        |), ser AS MATERIALIZED (
        |  SELECT date_diff('day', d0, day) AS t, coalesce(x, 0) AS x
        |  FROM cal LEFT JOIN daily USING (day)
        |), tot AS (SELECT count(*) AS n, sum(x) AS sx FROM ser),
        |den AS (
        |  SELECT sum((x * n - sx) * (x * n - sx)) AS dd FROM ser, tot
        |)
        |SELECT lr.range AS k, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(sum((a.x * n - sx) * (b.x * n - sx))::DOUBLE
        |    / (SELECT dd FROM den)::DOUBLE, 6) AS acf
        |FROM ser a
        |JOIN range(1, 8) lr ON true
        |JOIN ser b ON b.t = a.t + lr.range
        |CROSS JOIN tot
        |GROUP BY lr.range
        |ORDER BY lr.range""".stripMargin,

    // same integer-deviation cumulative scan (t is unique — the
    // window order is total) and earliest-argmax tiebreak
    "q213_cusum" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1
        |), span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |cal AS (
        |  SELECT unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS day, d0 FROM span
        |), ser AS MATERIALIZED (
        |  SELECT date_diff('day', d0, day) AS t, day, coalesce(x, 0) AS x
        |  FROM cal LEFT JOIN daily USING (day)
        |), tot AS (SELECT count(*) AS n, sum(x) AS tx FROM ser),
        |cum AS (
        |  SELECT t, day, sum(x * n - tx) OVER (ORDER BY t) AS s
        |  FROM ser, tot
        |), top AS (
        |  SELECT t AS split, day, abs(s) AS mx
        |  FROM cum ORDER BY abs(s) DESC, t ASC LIMIT 1
        |)
        |SELECT CAST(tot.n AS BIGINT) AS n_days,
        |  strftime(top.day, '%Y-%m-%d') AS split_day,
        |  CAST(top.mx AS BIGINT) AS max_abs_s,
        |  CAST(top.split + 1 AS BIGINT) AS n_before,
        |  CAST(tot.n - top.split - 1 AS BIGINT) AS n_after,
        |  round((SELECT sum(x) FROM ser WHERE t <= top.split)::DOUBLE
        |    / (top.split + 1), 6) AS mean_before,
        |  CASE WHEN tot.n - top.split - 1 = 0 THEN 0.0
        |    ELSE round((SELECT sum(x) FROM ser
        |      WHERE t > top.split)::DOUBLE
        |      / (tot.n - top.split - 1), 6) END AS mean_after
        |FROM top, tot""".stripMargin,

    // same distinct-domain LEFT-join census per candidate
    "q214_inclusion_deps" -> {
      def inc(name: String, ta: String, ca: String, tb: String,
          cb: String) =
        s"""SELECT '$name' AS dep, CAST(count(*) AS BIGINT) AS n_distinct,
  CAST(sum(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_missing,
  sum(CASE WHEN b IS NULL THEN 1 ELSE 0 END) = 0 AS holds
FROM (SELECT DISTINCT CAST($ca AS BIGINT) AS a FROM $ta) da
LEFT JOIN (SELECT DISTINCT CAST($cb AS BIGINT) AS b FROM $tb) db
  ON da.a = db.b"""
      Seq(
        inc("o_custkey<=c_custkey", "orders", "o_custkey",
          "customer", "c_custkey"),
        inc("l_partkey<=p_partkey", "lineitem", "l_partkey",
          "part", "p_partkey"),
        inc("l_suppkey<=s_suppkey", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        inc("c_nationkey<=n_nationkey", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        inc("p_size<=n_nationkey", "part", "p_size",
          "nation", "n_nationkey"),
        inc("c_custkey<=o_custkey", "customer", "c_custkey",
          "orders", "o_custkey")
      ).mkString("\nUNION ALL\n")
    },

    // DIRECT K-th smallest over the same deterministic hashes — a
    // value match proves the Spark side's daily-sketch merge lossless
    "q215_kmv_distinct" ->
      """WITH h AS MATERIALIZED (
        |  SELECT DISTINCT event_type,
        |    ('0x' || md5('kmv:' || user_id)[1:8])::BIGINT AS h
        |  FROM events
        |), r AS (
        |  SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nd
        |  FROM h
        |), ex AS (
        |  SELECT event_type,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1
        |), sk AS (
        |  SELECT event_type, max(nd) AS nd,
        |    CAST(least(max(nd), 64) AS BIGINT) AS sketch_m,
        |    CAST(coalesce(max(CASE WHEN rn = 64 THEN h END), 0)
        |      AS BIGINT) AS kth_h
        |  FROM r GROUP BY 1
        |), est AS (
        |  SELECT event_type, nd, sketch_m, kth_h,
        |    CASE WHEN nd < 64 THEN nd::DOUBLE
        |      ELSE round(63 * 4294967296.0 / kth_h, 6) END AS est
        |  FROM sk
        |)
        |SELECT ex.event_type, n_exact, sketch_m, kth_h, est,
        |  round(abs(est - n_exact) / n_exact, 6) AS rel_err
        |FROM est JOIN ex USING (event_type)
        |ORDER BY event_type""".stripMargin,

    // same integer S and tie-corrected variance over the same
    // zero-filled calendar
    "q216_mann_kendall" ->
      """WITH daily AS (
        |  SELECT ts::DATE AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1
        |), span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |cal AS (
        |  SELECT unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY))::DATE AS day, d0 FROM span
        |), ser AS MATERIALIZED (
        |  SELECT date_diff('day', d0, day) AS t, coalesce(x, 0) AS x
        |  FROM cal LEFT JOIN daily USING (day)
        |), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ser),
        |sp AS (
        |  SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
        |    WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM ser a JOIN ser b ON b.t > a.t
        |), ties AS (
        |  SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0)
        |    AS BIGINT) AS tt
        |  FROM (SELECT count(*) AS c FROM ser GROUP BY x)
        |), v AS (
        |  SELECT n, s, n * (n - 1) * (2 * n + 5) - tt AS var18
        |  FROM tot, sp, ties
        |), zc AS (
        |  SELECT n, s, var18,
        |    CASE WHEN s > 0
        |      THEN round((s - 1)::DOUBLE / sqrt(var18::DOUBLE / 18.0), 6)
        |    WHEN s < 0
        |      THEN round((s + 1)::DOUBLE / sqrt(var18::DOUBLE / 18.0), 6)
        |    ELSE 0.0 END AS z
        |  FROM v
        |)
        |SELECT n AS n_days, s AS s_stat, var18, z,
        |  CASE WHEN z > 1.96 THEN 'increasing'
        |    WHEN z < -1.96 THEN 'decreasing'
        |    ELSE 'no_trend' END AS trend
        |FROM zc""".stripMargin,

    // same apportionment integers and md5 rank selection
    "q217_stratified_sample" ->
      """WITH st AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS nh
        |  FROM documents GROUP BY 1
        |), tot AS (
        |  SELECT sum(nh) AS n, sum(nh) // 5 AS b FROM st
        |), ab AS (
        |  SELECT lang, nh, (b * nh) // n AS base, (b * nh) % n AS rem,
        |    b FROM st, tot
        |), lr AS (
        |  SELECT lang, nh, base, rem,
        |    row_number() OVER (ORDER BY rem DESC, lang ASC) AS rr,
        |    b - sum(base) OVER () AS leftover
        |  FROM ab
        |), alloc AS (
        |  SELECT lang, nh AS n_total,
        |    base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
        |      AS n_alloc
        |  FROM lr
        |), ranked AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || md5('ss:' || doc_id)[1:8])::BIGINT ASC,
        |        doc_id ASC) AS rk
        |  FROM documents
        |), sel AS (
        |  SELECT r.lang, r.doc_id
        |  FROM ranked r JOIN alloc a USING (lang)
        |  WHERE r.rk <= a.n_alloc
        |)
        |SELECT a.lang, a.n_total, CAST(a.n_alloc AS BIGINT) AS n_alloc,
        |  CAST(count(s.doc_id) AS BIGINT) AS n_sel,
        |  CAST(coalesce(sum(s.doc_id), 0) AS BIGINT) AS sel_checksum
        |FROM alloc a LEFT JOIN sel s ON a.lang = s.lang
        |GROUP BY 1, 2, 3
        |ORDER BY 1""".stripMargin,

    // same inclusive prefix sweep and (correct desc, t asc) argmax
    "q218_decision_stump" ->
      """WITH g AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p
        |  FROM orders GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(p) AS BIGINT) AS pp FROM g
        |), cum AS (
        |  SELECT v, sum(c) OVER (ORDER BY v) AS nl,
        |    sum(p) OVER (ORDER BY v) AS pl
        |  FROM g
        |), sc AS (
        |  SELECT v,
        |    greatest(pl, nl - pl)
        |      + greatest(pp - pl, (n - nl) - (pp - pl)) AS correct
        |  FROM cum, tot
        |), best AS (
        |  SELECT v, correct FROM sc
        |  ORDER BY correct DESC, v ASC LIMIT 1
        |)
        |SELECT CAST(best.v AS BIGINT) AS threshold, tot.n,
        |  CAST(best.correct AS BIGINT) AS n_correct,
        |  round(best.correct::DOUBLE / tot.n, 6) AS accuracy,
        |  CAST(greatest(pp, n - pp) AS BIGINT) AS majority_correct,
        |  round((best.correct - greatest(pp, n - pp))::DOUBLE / tot.n,
        |    6) AS gain
        |FROM best, tot""".stripMargin,

    // q237: same top-(k+1) order statistics, same rounded-ln DECIMAL
    // fold, same two final divisions — and the SAME degenerate guards
    // as the Spark path (fewer than k+1 rows, non-positive threshold,
    // or a zero ln-sum all flag, never divide by zero / drop the row)
    "q237_hill_tail" ->
      """WITH v AS (
        |  SELECT length(text)::BIGINT AS x FROM documents
        |), t AS (
        |  SELECT x, row_number() OVER (ORDER BY x DESC) AS r
        |  FROM v QUALIFY r <= 101
        |), thr AS (
        |  SELECT coalesce(max(CASE WHEN r = 101 THEN x END), 0) AS xt,
        |    count(*)::BIGINT AS tc
        |  FROM t
        |), s AS (
        |  SELECT coalesce(CAST(sum(CAST(round(ln(x::DOUBLE
        |      / nullif(CASE WHEN xt > 0 THEN xt END, 0)), 8)
        |    AS DECIMAL(20,8))) AS DECIMAL(38,8)), 0) AS sl
        |  FROM t, thr WHERE r <= 100
        |), n AS (SELECT count(*)::BIGINT AS n FROM v),
        |f AS (
        |  SELECT n, xt, (tc < 101 OR xt <= 0 OR sl = 0) AS dg, sl
        |  FROM n, thr, s
        |)
        |SELECT n, 100::BIGINT AS k, xt AS x_threshold,
        |  CASE WHEN dg THEN 0.0
        |    ELSE round(100::DOUBLE / sl::DOUBLE, 6) END AS alpha,
        |  CASE WHEN dg THEN 0.0
        |    ELSE round(pow(2, -(100::DOUBLE / sl::DOUBLE)), 6) END
        |    AS tail_halving,
        |  dg AS degenerate
        |FROM f""".stripMargin,

    // q238: identical integer fixing of the normalized components
    // (round(x/‖v‖·1e8)), identical moment identity in HUGEINT
    "q238_anisotropy" ->
      """WITH b AS (
        |  SELECT label,
        |    CASE WHEN list_sum(list_transform(CAST(embedding AS
        |        DOUBLE[]), y -> y * y)) = 0
        |      THEN list_transform(CAST(embedding AS DOUBLE[]),
        |        y -> CAST(0 AS BIGINT))
        |      ELSE list_transform(CAST(embedding AS DOUBLE[]),
        |        y -> CAST(round(y / sqrt(list_sum(list_transform(
        |          CAST(embedding AS DOUBLE[]), z -> z * z))) * 1e8)
        |          AS BIGINT)) END AS m
        |  FROM embeddings
        |), rq AS (
        |  SELECT label,
        |    CAST(coalesce(list_sum(list_transform(m, x -> x * x)), 0)
        |      AS HUGEINT) AS q
        |  FROM b
        |), lq AS (
        |  SELECT label, count(*)::BIGINT AS nl, sum(q) AS ql
        |  FROM rq GROUP BY label
        |), ds AS (
        |  SELECT label, i AS pos,
        |    CAST(sum(m[i]) AS HUGEINT) AS sl
        |  FROM b, unnest(range(1, len(m) + 1)) AS u(i)
        |  GROUP BY 1, 2
        |), lnorm AS (
        |  SELECT label, sum(sl * sl) AS nsq FROM ds GROUP BY label
        |), gds AS (
        |  SELECT pos, CAST(sum(sl) AS HUGEINT) AS sg FROM ds GROUP BY 1
        |), g AS (
        |  SELECT CAST(sum(nl) AS BIGINT) AS gn,
        |    CAST(sum(ql) AS HUGEINT) AS gq
        |  FROM lq
        |), gnorm AS (
        |  SELECT coalesce(sum(sg * sg), 0) AS gnsq FROM gds
        |), per AS (
        |  SELECT lq.label AS scope_label, nl AS n_vecs,
        |    CASE WHEN nl < 2 THEN 0.0
        |      ELSE round((coalesce(nsq, 0) - ql)::DOUBLE
        |        / (nl::DOUBLE * (nl - 1)) / 1e16, 6) END
        |      AS mean_pairwise_cos
        |  FROM lq LEFT JOIN lnorm ON lq.label = lnorm.label
        |)
        |SELECT * FROM per
        |UNION ALL
        |SELECT -1 AS scope_label, gn AS n_vecs,
        |  CASE WHEN gn < 2 THEN 0.0
        |    ELSE round((gnsq - gq)::DOUBLE
        |      / (gn::DOUBLE * (gn - 1)) / 1e16, 6) END
        |FROM g, gnorm
        |ORDER BY scope_label""".stripMargin,

    // q232: the same five integer moments in HUGEINT (128-bit — no
    // bit ever lost), same closed-form rational, one double division
    // per coefficient
    "q232_group_trend" ->
      """WITH p AS (
        |  SELECT source AS g, doc_id::HUGEINT AS x,
        |    length(text)::HUGEINT AS y
        |  FROM documents
        |), a AS (
        |  SELECT g, count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM p GROUP BY g
        |), f AS (
        |  SELECT g, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS den, sx, sy
        |  FROM a
        |)
        |SELECT g AS source, CAST(n AS BIGINT) AS n,
        |  CASE WHEN den = 0 THEN 0.0
        |    ELSE round(num::DOUBLE / den::DOUBLE, 8) END AS slope,
        |  CASE WHEN den = 0 THEN 0.0
        |    ELSE round((sy * den - num * sx)::DOUBLE
        |      / (n * den)::DOUBLE, 6) END AS intercept,
        |  (den = 0) AS degenerate
        |FROM f ORDER BY source""".stripMargin,

    // q233: identical nearest-rank selection over the (group x
    // distinct value) table, twice; every output an integer
    "q233_mad_outliers" ->
      """WITH v AS (
        |  SELECT source AS g, length(text)::BIGINT AS x FROM documents
        |), t AS (SELECT g, count(*)::BIGINT AS n FROM v GROUP BY g),
        |c1 AS (
        |  SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum
        |  FROM (SELECT g, x, count(*) AS c FROM v GROUP BY 1, 2)
        |), m1 AS (
        |  SELECT g, min(x) AS med
        |  FROM c1 JOIN t USING (g) WHERE cum >= (n + 1) // 2
        |  GROUP BY g
        |), d AS (
        |  SELECT v.g, abs(v.x - med) AS x FROM v JOIN m1 USING (g)
        |), c2 AS (
        |  SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum
        |  FROM (SELECT g, x, count(*) AS c FROM d GROUP BY 1, 2)
        |), m2 AS (
        |  SELECT g, min(x) AS mad
        |  FROM c2 JOIN t USING (g) WHERE cum >= (n + 1) // 2
        |  GROUP BY g
        |)
        |SELECT g AS source, n, med AS median, mad,
        |  CAST(sum(CASE WHEN abs(v.x - med) > 5 * mad THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_outliers
        |FROM v JOIN m1 USING (g) JOIN m2 USING (g) JOIN t USING (g)
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    // same integer percent binning, same ratio+rounded-gap algebra;
    // the ECE folds the <=10 bins through a DECIMAL sum
    "q229_calibration" ->
      """WITH b AS (
        |  SELECT CAST(round(l_discount * 1000) AS BIGINT) AS pct,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem
        |), g AS (
        |  SELECT least(pct // 10, 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(sum(pct) AS BIGINT) AS sp
        |  FROM b GROUP BY 1
        |), r AS (
        |  SELECT bin, n, pos,
        |    sp::DOUBLE / n / 100.0 AS pred,
        |    pos::DOUBLE / n AS obs
        |  FROM g
        |), w AS (
        |  SELECT bin, n, pos, pred, obs,
        |    CAST(round(abs(obs - pred), 8) AS DECIMAL(20,8)) AS gap8
        |  FROM r
        |), t AS (
        |  SELECT sum(gap8 * n) AS wg, CAST(sum(n) AS BIGINT) AS nn
        |  FROM w
        |)
        |SELECT bin, n, pos, round(pred, 6) AS pred_mean,
        |  round(obs, 6) AS obs_rate, round(gap8::DOUBLE, 6) AS abs_gap,
        |  round(wg::DOUBLE / nn, 6) AS ece
        |FROM w, t ORDER BY bin""".stripMargin,

    // the oracle builds the sketches DIRECTLY (K smallest hashes of
    // each full domain) and the exact overlap census — matching the
    // distributed sketch path proves the typed-aggregator fold AND
    // the estimator algebra; 255·2⁴⁸ has 8 significant bits so the
    // double arithmetic is engine-identical
    "q219_kmv_setops" ->
      """WITH a AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS kk FROM lineitem
        |  WHERE year(l_shipdate) = 1996
        |), b AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS kk FROM lineitem
        |  WHERE year(l_shipdate) = 1997
        |), ka AS MATERIALIZED (
        |  SELECT ('0x' || substring(md5('kso:' || kk), 1, 12))::BIGINT
        |    AS h
        |  FROM a ORDER BY 1 LIMIT 256
        |), kb AS MATERIALIZED (
        |  SELECT ('0x' || substring(md5('kso:' || kk), 1, 12))::BIGINT
        |    AS h
        |  FROM b ORDER BY 1 LIMIT 256
        |), ku AS MATERIALIZED (
        |  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
        |  ORDER BY h LIMIT 256
        |), ex AS (
        |  SELECT (SELECT count(*) FROM a) AS n_a,
        |    (SELECT count(*) FROM b) AS n_b,
        |    (SELECT count(*) FROM a JOIN b USING (kk)) AS n_inter
        |), sk AS (
        |  SELECT (SELECT count(*) FROM ka) AS ma,
        |    (SELECT max(h) FROM ka) AS hka,
        |    (SELECT count(*) FROM kb) AS mb,
        |    (SELECT max(h) FROM kb) AS hkb,
        |    (SELECT count(*) FROM ku) AS mu,
        |    (SELECT max(h) FROM ku) AS hku,
        |    (SELECT count(*) FROM ku
        |     WHERE h IN (SELECT h FROM ka)
        |       AND h IN (SELECT h FROM kb)) AS rho
        |), est AS (
        |  SELECT *,
        |    CASE WHEN ma < 256 THEN ma::DOUBLE
        |      ELSE round(255 * 281474976710656.0 / hka, 6) END AS ea,
        |    CASE WHEN mb < 256 THEN mb::DOUBLE
        |      ELSE round(255 * 281474976710656.0 / hkb, 6) END AS eb,
        |    CASE WHEN mu < 256 THEN mu::DOUBLE
        |      ELSE round(255 * 281474976710656.0 / hku, 6) END AS eu
        |  FROM sk
        |)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(n_inter AS BIGINT) AS n_inter,
        |  round(n_inter::DOUBLE / (n_a + n_b - n_inter), 6)
        |    AS jaccard_exact,
        |  ea AS est_a, eb AS est_b, eu AS est_union,
        |  CAST(rho AS BIGINT) AS rho,
        |  round(rho * eu / 256, 6) AS est_inter,
        |  round(rho::DOUBLE / 256, 6) AS jaccard_est,
        |  round(abs(eu - (n_a + n_b - n_inter))
        |    / (n_a + n_b - n_inter), 6) AS rel_err_union
        |FROM est, ex""".stripMargin,

    // same histogram census — the oracle also never executes the
    // forecast joins; HUGEINT products/sums (exact, matching the
    // Spark side's DECIMAL(38,0)), integer ppm, one rounded expansion
    // ratio; empty-match joins yield NULL top fields and 0 out_rows
    "q220_join_forecast" ->
      """WITH ho AS MATERIALIZED (
        |  SELECT o_orderkey::VARCHAR AS k, count(*)::HUGEINT AS a
        |  FROM orders GROUP BY 1
        |), hl AS MATERIALIZED (
        |  SELECT l_orderkey::VARCHAR AS k, count(*)::HUGEINT AS b
        |  FROM lineitem GROUP BY 1
        |), he AS MATERIALIZED (
        |  SELECT user_id::VARCHAR AS k, count(*)::HUGEINT AS c
        |  FROM events GROUP BY 1
        |), hd AS MATERIALIZED (
        |  SELECT lang AS k, count(*)::HUGEINT AS c
        |  FROM documents GROUP BY 1
        |), j1 AS MATERIALIZED (
        |  SELECT k, a * b AS ab FROM ho JOIN hl USING (k)
        |), j2 AS MATERIALIZED (SELECT k, c * c AS ab FROM he),
        |j3 AS MATERIALIZED (SELECT k, c * c AS ab FROM hd),
        |rows_all AS (
        |  SELECT 'orders*lineitem@orderkey' AS join_name,
        |    (SELECT sum(a) FROM ho) AS n_left,
        |    (SELECT sum(b) FROM hl) AS n_right,
        |    (SELECT count(*) FROM ho) AS keys_left,
        |    (SELECT count(*) FROM hl) AS keys_right,
        |    (SELECT count(*) FROM j1) AS keys_matching,
        |    (SELECT sum(ab) FROM j1) AS out_rows,
        |    (SELECT k FROM j1 ORDER BY ab DESC, k LIMIT 1) AS top_key,
        |    (SELECT ab FROM j1 ORDER BY ab DESC, k LIMIT 1)
        |      AS top_key_out
        |  UNION ALL
        |  SELECT 'events*events@user_id',
        |    (SELECT sum(c) FROM he), (SELECT sum(c) FROM he),
        |    (SELECT count(*) FROM he), (SELECT count(*) FROM he),
        |    (SELECT count(*) FROM j2), (SELECT sum(ab) FROM j2),
        |    (SELECT k FROM j2 ORDER BY ab DESC, k LIMIT 1),
        |    (SELECT ab FROM j2 ORDER BY ab DESC, k LIMIT 1)
        |  UNION ALL
        |  SELECT 'documents*documents@lang',
        |    (SELECT sum(c) FROM hd), (SELECT sum(c) FROM hd),
        |    (SELECT count(*) FROM hd), (SELECT count(*) FROM hd),
        |    (SELECT count(*) FROM j3), (SELECT sum(ab) FROM j3),
        |    (SELECT k FROM j3 ORDER BY ab DESC, k LIMIT 1),
        |    (SELECT ab FROM j3 ORDER BY ab DESC, k LIMIT 1)
        |)
        |SELECT join_name, CAST(n_left AS BIGINT) AS n_left,
        |  CAST(n_right AS BIGINT) AS n_right,
        |  CAST(keys_left AS BIGINT) AS keys_left,
        |  CAST(keys_right AS BIGINT) AS keys_right,
        |  CAST(keys_matching AS BIGINT) AS keys_matching,
        |  CAST(coalesce(out_rows, 0) AS BIGINT) AS out_rows, top_key,
        |  CAST(top_key_out AS BIGINT) AS top_key_out,
        |  CAST(CASE WHEN coalesce(out_rows, 0) = 0 THEN NULL
        |    ELSE (top_key_out * 1000000) // out_rows END AS BIGINT)
        |    AS top_share_ppm,
        |  round(coalesce(out_rows, 0)::DOUBLE
        |    / greatest(n_left, n_right), 6) AS expansion
        |FROM rows_all""".stripMargin,

    // same integer nearest-rank algebra: per-source row_number with
    // the identical (n_chars, doc_id) tiebreak, position intervals
    // unnested to the same position→value lookup
    "q221_quantile_norm" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id, source, n_chars FROM documents
        |), tot AS (SELECT count(*) AS n FROM d),
        |ns AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1),
        |rk AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS src_rank
        |  FROM d
        |), pos AS (
        |  SELECT doc_id, source, n_chars, src_rank,
        |    (src_rank * n + n_s - 1) // n_s AS global_pos
        |  FROM rk JOIN ns USING (source), tot
        |), g AS (
        |  SELECT n_chars AS v, count(*) AS c,
        |    coalesce(sum(count(*)) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cb
        |  FROM d GROUP BY n_chars
        |), pv AS (
        |  SELECT v AS normalized,
        |    cb + unnest(generate_series(1, c)) AS global_pos
        |  FROM g
        |)
        |SELECT doc_id, source, n_chars,
        |  CAST(src_rank AS BIGINT) AS src_rank,
        |  CAST(global_pos AS BIGINT) AS global_pos, normalized
        |FROM pos JOIN pv USING (global_pos)""".stripMargin,

    // q246: the same 48-bit md5 uniform, the same rounded ln score,
    // the same (score desc, doc_id) top-20
    "q246_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  round(ln((('0x' || md5('ws:' || doc_id)[1:12])::BIGINT + 1)
        |    / 281474976710657.0) / n_chars, 9) AS skey
        |FROM documents
        |ORDER BY skey DESC, doc_id LIMIT 20""".stripMargin
  )
}
