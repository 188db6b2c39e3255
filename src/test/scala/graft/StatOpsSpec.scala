package graft

import org.apache.spark.sql.functions._

import graft.operators.StatOps

/** Closed-form pins for the distribution-statistics family: Gini's
  * textbook extremes and tie invariance, and the Benford literal
  * table's probability-measure property. */
class StatOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def gini(vs: Seq[Long]): (Long, Long, Double) = {
    val r = StatOps.giniExact(vs.toDF("v")).head()
    (r.getAs[Long]("n"), r.getAs[Long]("total_cents"),
      r.getAs[Double]("gini"))
  }

  test("gini: perfect equality reads 0") {
    assert(gini(Seq(7L, 7L, 7L, 7L)) == ((4L, 28L, 0.0)))
  }

  test("gini: one holder takes all reads (n-1)/n") {
    val (n, s, g) = gini(Seq(0L, 0L, 0L, 0L, 100L))
    assert(n == 5L && s == 100L && g == 0.8)
  }

  test("gini matches brute-force rank formula on tied mixed data") {
    val vs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L)
    val sorted = vs.sorted
    val n = vs.size
    val sv = vs.sum
    val t = sorted.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum
    val expect = BigDecimal((2.0 * t - (n + 1.0) * sv) / (n.toDouble * sv))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gini(vs)._3 == expect)
  }

  test("benford literals: a 10-dp probability measure, monotone in d") {
    val ps = (1 to 9).map(d => BigDecimal(StatOps.benfordP(d)))
    assert((ps.sum - 1).abs <= BigDecimal("0.0000000009") * 9)
    assert(ps == ps.sortBy(p => -p))
    assert(StatOps.benfordP(1) == "0.3010299957")
  }

  private def rho(ps: Seq[(Long, Long)]): Double =
    StatOps.spearmanExact(ps.toDF("a", "b")).head().getAs[Double]("rho")

  test("spearman: strictly monotone reads 1, reversed reads -1") {
    val mono = Seq((1L, 10L), (2L, 40L), (3L, 90L), (5L, 160L))
    assert(rho(mono) == 1.0)
    assert(rho(mono.map { case (a, b) => (a, -b) }) == -1.0)
  }

  test("spearman: tie-heavy case matches the average-rank hand formula") {
    // a: (1,1,2) → avg ranks (1.5, 1.5, 3); b: (5,7,7) → (1, 2.5, 2.5)
    // pearson on ranks: num = 3*Σrarb - ΣraΣrb with doubled ranks
    val got = rho(Seq((1L, 5L), (1L, 7L), (2L, 7L)))
    val (ra, rb) = (Seq(1.5, 1.5, 3.0), Seq(1.0, 2.5, 2.5))
    val n = 3
    val num = n * ra.zip(rb).map { case (x, y) => x * y }.sum -
      ra.sum * rb.sum
    val den = math.sqrt(n * ra.map(x => x * x).sum - ra.sum * ra.sum) *
      math.sqrt(n * rb.map(x => x * x).sum - rb.sum * rb.sum)
    val expect = BigDecimal(num / den)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == expect)
  }

  private def cusum(xs: Seq[Long]) = {
    val ser = xs.zipWithIndex
      .map { case (x, t) => (t.toLong, s"day$t", x) }
      .toDF("t", "day", "x")
    StatOps.cusumSplit(ser).head()
  }

  test("cusum: planted level shift splits exactly at the step") {
    // 5 days at 10 then 5 days at 50: |S_t| peaks at t=4 (last low day)
    val r = cusum(Seq(10L, 10L, 10L, 10L, 10L, 50L, 50L, 50L, 50L, 50L))
    assert(r.getAs[String]("split_day") == "day4")
    assert(r.getAs[Long]("n_before") == 5L)
    assert(r.getAs[Double]("mean_before") == 10.0)
    assert(r.getAs[Double]("mean_after") == 50.0)
    // S_4 = Σ(10·x − 300) over 5 low days = 5·(100−300) = -1000
    assert(r.getAs[Long]("max_abs_s") == 1000L)
  }

  test("cusum: flat series reads zero deviation, earliest-t tiebreak") {
    val r = cusum(Seq(7L, 7L, 7L, 7L))
    assert(r.getAs[Long]("max_abs_s") == 0L)
    assert(r.getAs[String]("split_day") == "day0")
  }

  test("kmv sketch: order-independent, capped, dedup'd, and merge " +
      "is lossless (merge of split streams == direct sketch of union)") {
    val agg = new graft.operators.StatOps.KmvSketchAgg(4)
    def build(hs: Seq[Long]) = hs.foldLeft(agg.zero)(agg.reduce)
    val hs = Seq(50L, 10L, 90L, 10L, 30L, 70L, 20L, 90L, 60L)
    val direct = build(hs)
    assert(direct.toSeq == Seq(10L, 20L, 30L, 50L)) // 4 smallest, dedup'd
    assert(build(hs.reverse).toSeq == direct.toSeq)
    // split anywhere, sketch each half, merge: identical to direct —
    // the invariant that makes the daily-rollup path exact
    for (cut <- 1 until hs.size) {
      val (l, r) = hs.splitAt(cut)
      assert(agg.merge(build(l), build(r)).toSeq == direct.toSeq)
    }
    assert(build(Seq(5L)).toSeq == Seq(5L)) // under-full stays exact
  }

  test("kmv set algebra: saturated K is exact; half-overlap estimates match") {
    import graft.operators.StatOps.{kmvSetAlgebra, kmvEst}
    // K >= |domain|: every estimate collapses to the exact value
    val a = Array(10L, 20L, 30L, 40L)
    val b = Array(30L, 40L, 50L, 60L)
    val (u, rho, estU, estI) = kmvSetAlgebra(a, b, k = 16)
    assert(u.toSeq == Seq(10L, 20L, 30L, 40L, 50L, 60L))
    assert(rho == 2L && estU == 6.0 && estI == 0.75)
    assert(kmvEst(a, 16) == 4.0)
    // saturated sketches: union = K smallest of merge, rho counts
    // only union-sketch members present in BOTH side sketches
    val (u2, rho2, _, _) =
      kmvSetAlgebra(Array(1L, 2L, 3L), Array(2L, 3L, 9L), k = 3)
    assert(u2.toSeq == Seq(1L, 2L, 3L) && rho2 == 2L)
    // h_K(A∪B) <= min(h_K sides): every union member decidable
    assert(u2.last <= math.min(3L, 9L))
  }

  test("join forecast: exact Σab census, integer ppm, smallest-key tiebreak") {
    val left = Seq("a", "a", "b").toDF("k")
    val right = Seq("a", "b", "b", "c").toDF("k")
    val (_, nL, nR, kL, kR, kM, out, topK, topAb, ppm, exp) =
      StatOps.joinForecast("t", left, right)
    assert((nL, nR, kL, kR, kM) == ((3L, 4L, 2L, 3L, 2L)))
    assert(out == 4L) // a: 2*1, b: 1*2
    assert(topK == Some("a") && topAb == Some(2L)) // 'a' ties 'b' -> k asc
    assert(ppm == Some(500000L) && exp == 1.0)
    // disjoint key sets: NULL top fields and zero out_rows, never a
    // head() throw or a divide-by-zero (the oracle's convention)
    val (_, _, _, _, _, kM0, out0, topK0, topAb0, ppm0, exp0) =
      StatOps.joinForecast("t0", Seq("x").toDF("k"), Seq("y").toDF("k"))
    assert(kM0 == 0L && out0 == 0L && exp0 == 0.0)
    assert(topK0.isEmpty && topAb0.isEmpty && ppm0.isEmpty)
  }

  test("quantile norm: hand mapping and the rank-preservation closure") {
    // s1 = [10, 20] (n_s=2), s2 = [1, 2, 3, 4] (n_s=4), N=6
    // global sorted = [1, 2, 3, 4, 10, 20]
    // s1: p = ceil(r*6/2) = 3, 6      -> normalized 3, 20
    // s2: p = ceil(r*6/4) = 2, 3, 5, 6 -> normalized 2, 3, 10, 20
    val docs = Seq(
      (1L, "s1", 10L), (2L, "s1", 20L),
      (3L, "s2", 1L), (4L, "s2", 2L), (5L, "s2", 3L), (6L, "s2", 4L))
      .toDF("doc_id", "source", "n_chars")
    val got = StatOps.quantileNormalize(docs)
      .select("doc_id", "src_rank", "global_pos", "normalized")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 3L, 3L), (2L, 2L, 6L, 20L),
      (3L, 1L, 2L, 2L), (4L, 2L, 3L, 3L), (5L, 3L, 5L, 10L),
      (6L, 4L, 6L, 20L)))
    // equal-size sources: every source maps rank i to the SAME value
    val eq = Seq((1L, "a", 50L), (2L, "a", 10L), (3L, "b", 7L),
      (4L, "b", 99L)).toDF("doc_id", "source", "n_chars")
    val byRank = StatOps.quantileNormalize(eq)
      .select("source", "src_rank", "normalized").collect()
      .groupBy(_.getLong(1)).values
    assert(byRank.forall(rows => rows.map(_.getLong(2)).toSet.size == 1))
  }

  private def mk(xs: Seq[Long]) = {
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }
      .toDF("t", "x")
    graft.operators.StatOps.mannKendall(df).head()
  }

  test("mann-kendall: hand-walked series (short monotone under the " +
      "gate, long monotone over it, all-tied zero)") {
    val short = mk(Seq(1L, 2L, 3L, 4L)) // S=6, var18=4·3·13=156
    assert(short.getAs[Long]("s_stat") == 6L)
    assert(short.getAs[Long]("var18") == 156L)
    val zs = BigDecimal(5.0 / math.sqrt(156.0 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(short.getAs[Double]("z") == zs)
    assert(short.getAs[String]("trend") == "no_trend")
    val long = mk((1L to 10L).toSeq) // S=45, var18=2250, z≈3.93
    assert(long.getAs[Long]("s_stat") == 45L)
    assert(long.getAs[String]("trend") == "increasing")
    val flat = mk(Seq(5L, 5L, 5L))
    assert(flat.getAs[Long]("s_stat") == 0L &&
      flat.getAs[Double]("z") == 0.0 &&
      flat.getAs[String]("trend") == "no_trend")
  }

  test("largest remainder: sums to budget, caps at population, " +
      "hand-checked apportionment") {
    val counts = Seq(("a", 7L), ("b", 5L), ("c", 3L)) // n=15
    val got = StatOps.largestRemainder(counts, 10L)
    // quotas 4.67/3.33/2.0 → floors 4/3/2, leftover 1 → largest
    // remainder is a (.67)
    assert(got == Seq(("a", 7L, 5L), ("b", 5L, 3L), ("c", 3L, 2L)))
    assert(got.map(_._3).sum == 10L)
    assert(got.forall { case (_, nh, al) => al <= nh })
    // b == n degenerates to the full population
    assert(StatOps.largestRemainder(counts, 15L).map(_._3) ==
      Seq(7L, 5L, 3L))
    // remainder tie broken by stratum name: quotas 0.5/0.5 → "a" wins
    assert(StatOps.largestRemainder(Seq(("a", 2L), ("b", 2L)), 1L) ==
      Seq(("a", 2L, 1L), ("b", 2L, 0L)))
  }

  private def stump(rows: Seq[(Long, Long)]) =
    StatOps.decisionStump(rows.toDF("v", "p")).head()

  test("decision stump: perfectly separable split found exactly") {
    // p=1 iff v <= 20: threshold 20 classifies all 6 rows
    val r = stump(Seq((10L, 1L), (15L, 1L), (20L, 1L),
      (30L, 0L), (40L, 0L), (50L, 0L)))
    assert(r.getAs[Long]("threshold") == 20L)
    assert(r.getAs[Long]("n_correct") == 6L)
    assert(r.getAs[Double]("accuracy") == 1.0)
    assert(r.getAs[Long]("majority_correct") == 3L)
    assert(r.getAs[Double]("gain") == 0.5)
  }

  test("decision stump: one-class corpus gains nothing, earliest " +
      "threshold tiebreak") {
    val r = stump(Seq((5L, 1L), (9L, 1L), (12L, 1L)))
    assert(r.getAs[Long]("n_correct") == 3L)
    assert(r.getAs[Double]("gain") == 0.0)
    assert(r.getAs[Long]("threshold") == 5L) // all splits tie → min v
  }

  test("hill tail index: closed form on a geometric ladder, " +
      "degenerate corners flagged") {
    def r8(v: Double) = BigDecimal(v)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    def r6d(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // top-3 of (8,4,2,1,1) with k=2: thr=2, sum = ln4 + ln2 (rounded)
    val r = StatOps.hillTail(
      Seq(8L, 4L, 2L, 1L, 1L).toDF("x"), k = 2).head()
    val sum = r8(math.log(4.0)) + r8(math.log(2.0))
    assert(r.getAs[Long]("x_threshold") == 2L)
    assert(r.getAs[Double]("alpha") == r6d(2.0 / sum.toDouble))
    assert(!r.getAs[Boolean]("degenerate"))
    // fewer than k+1 rows -> degenerate, zeroed
    assert(StatOps.hillTail(Seq(5L, 3L).toDF("x"), k = 2)
      .head().getAs[Boolean]("degenerate"))
    // all top values equal the threshold -> ln-sum 0 -> degenerate
    assert(StatOps.hillTail(Seq(7L, 7L, 7L, 7L).toDF("x"), k = 2)
      .head().getAs[Boolean]("degenerate"))
  }

  test("anisotropy: exact closed forms and identity == brute pairwise") {
    import org.apache.spark.sql.functions._
    // identical (3,4) vectors: rounded components are EXACT
    // (0.6, 0.8)*1e8, so mean pairwise cosine is exactly 1
    val same = Seq((0, Seq(3.0, 4.0)), (0, Seq(3.0, 4.0)),
      (0, Seq(3.0, 4.0))).toDF("label", "v")
    val r1 = StatOps.anisotropy(same).collect()
      .map(x => x.getAs[Int]("scope_label") -> x).toMap
    assert(r1(0).getAs[Double]("mean_pairwise_cos") == 1.0)
    assert(r1(-1).getAs[Double]("mean_pairwise_cos") == 1.0)
    // orthogonal pair -> 0; a zero vector contributes zero dots
    val orth = Seq((1, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)),
      (1, Seq(0.0, 0.0))).toDF("label", "v")
    val r2 = StatOps.anisotropy(orth).collect()
      .map(x => x.getAs[Int]("scope_label") -> x).toMap
    assert(r2(1).getAs[Double]("mean_pairwise_cos") == 0.0)
    // a label whose vectors are ALL empty arrays: posexplode yields
    // no per-dimension rows for it, but the census still emits the
    // row (zero mean, counted vectors) instead of throwing
    val empt = Seq((2, Seq.empty[Double]), (2, Seq.empty[Double]))
      .toDF("label", "v")
    val r3e = StatOps.anisotropy(empt).collect()
      .map(x => x.getAs[Int]("scope_label") -> x).toMap
    assert(r3e(2).getAs[Double]("mean_pairwise_cos") == 0.0)
    assert(r3e(2).getAs[Long]("n_vecs") == 2L)
    // identity == brute: fixed vectors, brute mean over ordered pairs
    // of the SAME integer-fixed normalized components
    val vecs = Seq(Seq(1.0, 2.0, 2.0), Seq(2.0, 1.0, 2.0),
      Seq(5.0, 0.0, 1.0), Seq(1.0, 1.0, 1.0))
    val df = vecs.map(v => (9, v)).toDF("label", "v")
    val got = StatOps.anisotropy(df).collect()
      .find(_.getAs[Int]("scope_label") == 9).get
      .getAs[Double]("mean_pairwise_cos")
    val ms = vecs.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => math.round(x / n * 1e8))
    }
    val pairs = for {
      i <- ms.indices; j <- ms.indices if i != j
    } yield ms(i).zip(ms(j)).map { case (a, b) => a * b }.sum
    val brute = pairs.map(BigInt(_)).sum.toDouble /
      (ms.length.toDouble * (ms.length - 1).toDouble) / 1e16
    def r6d(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == r6d(brute))
  }

  test("grouped OLS: exact line, slope shift-invariance, den=0 guard") {
    // perfect line y = 2x + 3
    val line = Seq(("a", 0L, 3L), ("a", 1L, 5L), ("a", 2L, 7L),
      ("a", 3L, 9L)).toDF("g", "x", "y")
    val r = StatOps.groupedOls(line).head()
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 3.0)
    assert(!r.getAs[Boolean]("degenerate"))
    // slope is invariant under an x shift; intercept moves by -2*1000
    val shifted = StatOps.groupedOls(
      line.select(col("g"), (col("x") + 1000L).as("x"), col("y")))
      .head()
    assert(shifted.getAs[Double]("slope") == 2.0)
    assert(shifted.getAs[Double]("intercept") == 3.0 - 2000.0)
    // constant x: den = 0 -> flagged, zeroed, never NaN
    val const = StatOps.groupedOls(Seq(("c", 5L, 1L), ("c", 5L, 9L))
      .toDF("g", "x", "y")).head()
    assert(const.getAs[Boolean]("degenerate"))
    assert(const.getAs[Double]("slope") == 0.0)
  }

  test("grouped MAD: hand-computed medians, even-count lower median, " +
      "constant group") {
    // odd group: values 1,2,3,4,100 -> med 3; |x-3| sorted
    // 0,1,1,2,97 -> mad 1; |x-3| > 5 only for 100
    val v = (Seq(1L, 2L, 3L, 4L, 100L).map(("odd", _)) ++
      Seq(1L, 2L, 3L, 4L).map(("even", _)) ++
      Seq(7L, 7L, 7L).map(("const", _))).toDF("g", "x")
    val r = StatOps.groupedMadOutliers(v, thr = 5).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("odd").getAs[Long]("median") == 3L)
    assert(r("odd").getAs[Long]("mad") == 1L)
    assert(r("odd").getAs[Long]("n_outliers") == 1L)
    // even count: nearest-rank (n+1) DIV 2 = 2 -> LOWER median 2
    assert(r("even").getAs[Long]("median") == 2L)
    assert(r("even").getAs[Long]("mad") == 1L)
    assert(r("even").getAs[Long]("n_outliers") == 0L)
    // constant group: mad 0, strict > keeps outliers at 0
    assert(r("const").getAs[Long]("median") == 7L)
    assert(r("const").getAs[Long]("mad") == 0L)
    assert(r("const").getAs[Long]("n_outliers") == 0L)
  }

  test("calibration curve: perfectly calibrated frame has ECE 0") {
    // 10 rows at pct=30 with exactly 3 positives: pred 0.3 == obs 0.3
    val rows = (0 until 10).map(i => (30L, if (i < 3) 1L else 0L))
    val r = StatOps.calibrationCurve(rows.toDF("pct", "y")).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("bin") == 3L)
    assert(r.head.getAs[Double]("pred_mean") == 0.3)
    assert(r.head.getAs[Double]("obs_rate") == 0.3)
    assert(r.head.getAs[Double]("abs_gap") == 0.0)
    assert(r.head.getAs[Double]("ece") == 0.0)
  }

  test("calibration curve: constant-score frame's gap IS the ECE; " +
      "pct=100 folds into bin 9") {
    // 4 rows at pct=100, 1 positive: pred 1.0, obs 0.25, gap 0.75
    val r = StatOps.calibrationCurve(
      Seq((100L, 1L), (100L, 0L), (100L, 0L), (100L, 0L))
        .toDF("pct", "y")).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("bin") == 9L)
    assert(r.head.getAs[Double]("abs_gap") == 0.75)
    assert(r.head.getAs[Double]("ece") == 0.75)
  }

  test("calibration curve: ECE is the n-weighted gap average") {
    // bin 0: 3 rows pct=0, all positive -> gap 1.0
    // bin 9: 1 row pct=90, positive    -> gap 0.1
    // ECE = (3*1.0 + 1*0.1) / 4 = 0.775
    val r = StatOps.calibrationCurve(
      Seq((0L, 1L), (0L, 1L), (0L, 1L), (90L, 1L)).toDF("pct", "y"))
      .collect().map(x => x.getAs[Long]("bin") -> x).toMap
    assert(r(0L).getAs[Double]("abs_gap") == 1.0)
    assert(math.abs(r(9L).getAs[Double]("abs_gap") - 0.1) < 1e-9)
    assert(r(0L).getAs[Double]("ece") == 0.775)
    assert(r(9L).getAs[Double]("ece") == 0.775)
  }

  test("inclusion audit: containment holds, misses counted exactly") {
    val a = Seq(1L, 2L, 2L, 3L, 9L).toDF("x")
    val b = Seq(1L, 2L, 3L, 4L).toDF("y")
    val hit = StatOps.inclusionAudit("b_covers", a, "x", b, "y").head()
    assert(hit.getAs[Long]("n_distinct") == 4L)
    assert(hit.getAs[Long]("n_missing") == 1L) // the 9
    assert(!hit.getAs[Boolean]("holds"))
    val ok = StatOps.inclusionAudit("rev", b.filter(col("y") < 4), "y",
      a, "x").head()
    assert(ok.getAs[Boolean]("holds"))
  }

  test("q299 Wilcoxon: hand-ranked fixture with ties; zeros dropped") {
    // diffs: +1, -2, +2, +3, 0 → nonzero n=4; |d| ranks: 1→1,
    // 2,2→avg 2.5 (doubled 5), 3→4; W+ = 1 + 2.5 + 4 = 7.5
    // (doubled 15), W- = 2.5 (doubled 5); 15 + 5 = 4·5 ✓
    val r = StatOps.wilcoxonSignedRank(
      Seq(1L, -2L, 2L, 3L, 0L).toDF("d")).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("w2_plus") == 15L)
    assert(r.getAs[Long]("w2_minus") == 5L)
    // z = (7.5 - 5) / sqrt(4·5·9/24) = 2.5/sqrt(7.5)
    val want = math.rint(2.5 / math.sqrt(7.5) * 1e6) / 1e6
    assert(r.getAs[Double]("z") == want)
  }

  test("q294 EWMA: closed form == exact sequential recurrence") {
    import java.sql.Timestamp
    // counts 1,2,4,3,9 across five days — s_i picks up binary
    // fractions (1.5, 2.75, …) that any float drift or premature
    // floor would move at the 1e6 fixed point
    val counts = Seq(1, 2, 4, 3, 9)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(k => (d.toLong * 100 + k,
        Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00")))
    }
    val ev = rows.toDF("event_id", "ts")
    val got = StatOps.ewmaForecast(ev).collect()
    assert(got.length == 5)
    // exact rational recurrence with BigDecimal (halving is exact
    // in base 10 too), floored to 1e6 fixed point only at the end:
    // s_1 = c_1; s_i = (c_i + s_{i-1}) / 2
    var st = BigDecimal(counts.head)
    val ewmas = counts.zipWithIndex.map { case (c, i) =>
      if (i > 0) st = (BigDecimal(c) + st) / 2
      (st * 1000000).setScale(0, BigDecimal.RoundingMode.FLOOR)
        .toLongExact
    }
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("cnt") == counts(i).toLong)
      assert(r.getAs[Long]("ewma_fp") == ewmas(i),
        s"day $i: ${r.getAs[Long]("ewma_fp")} != ${ewmas(i)}")
      if (i == 0) assert(r.isNullAt(r.fieldIndex("forecast_fp")))
      else {
        assert(r.getAs[Long]("forecast_fp") == ewmas(i - 1))
        assert(r.getAs[Long]("abs_err_fp") ==
          math.abs(counts(i) * 1000000L - ewmas(i - 1)))
      }
    }
  }
}
