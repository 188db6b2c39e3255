package graft

/** Prior-round bench-artifact parsing for the cross-round drift guard
  * (r9 verdict item 2) plus the min-merged priors store (r11 verdict
  * item 2). The detail artifact is JSON this program itself emits, so
  * the extraction is a few stable shapes: the flat `"priors"` /
  * `"queries"` / `"headline_priors"` / `"headline_metrics"` maps, and
  * (for pre-r10 artifacts that lack the flat headline map) n-anchored
  * lookups inside the nested harness point blocks. */
object DriftBaseline {
  private val numPair = """"([^"]+)"\s*:\s*(-?[0-9][0-9.eE+-]*)""".r

  private[graft] def flatMapOf(block: String): Map[String, Double] =
    numPair.findAllMatchIn(block).map(m =>
      m.group(1) -> m.group(2).toDouble).toMap

  private def flatField(text: String, key: String)
      : Option[Map[String, Double]] =
    ("\"" + key + "\"\\s*:\\s*\\{([^}]*)\\}").r.findFirstMatchIn(text)
      .map(m => flatMapOf(m.group(1))).filter(_.nonEmpty)

  /** The per-query baseline map from a prior detail artifact: the
    * min-merged `priors` map when present (r12+ — a contended run's
    * own inflated `queries` readings must never become baselines, see
    * [[mergePriors]]), else the run's own readings. */
  def queriesOf(priorText: String): Map[String, Double] =
    flatField(priorText, "priors")
      .orElse(flatField(priorText, "queries"))
      .getOrElse(Map.empty)

  /** Small-point (sf0.01 scale pass) baselines: the min-merged
    * `scale_priors` map when present (r13+), else the prior run's own
    * `"small"` readings inside the scale block (the r12 bootstrap).
    * These feed the small pass's cheapest-first order and per-query
    * caps (r12 verdict items 1/4: the small pass ran a fixed list
    * uncapped and one starved 56.8s reading starved 3 of 4 family
    * floors out of the artifact). */
  def scaleOf(priorText: String): Map[String, Double] =
    flatField(priorText, "scale_priors")
      .orElse(flatField(priorText, "small"))
      .getOrElse(Map.empty)

  /** The biggest-point metrics every harness headline rests on. */
  val HeadlineKeys: Seq[String] = Seq("lsh_sec", "sub_sec", "tri_sec",
    "pr_sec", "kcore_sec", "mst_sec", "session_sec", "brute_sec")

  /** Harness headline baselines: the min-merged `headline_priors` map
    * when present (r12+), else the flat `headline_metrics` map
    * (r10/r11), else the metric's first occurrence inside an
    * `"n":1000000` point block — every pre-r10 point json leads with
    * its `n` and keeps these keys before any nested `first_run`
    * object, so `[^{}]*?` cannot cross a block boundary.
    *
    * Keys are `<metric>@<n>` as of r12 (one entry per COMPLETED
    * harness point — a drift comparison is same-scale by
    * construction); plain pre-r12 keys are normalized to `@1000000`,
    * the biggest default size their emission paths measured. */
  def headlineOf(priorText: String): Map[String, Double] =
    flatField(priorText, "headline_priors")
      .orElse(flatField(priorText, "headline_metrics"))
      .getOrElse(HeadlineKeys.flatMap { k =>
        (""""n":1000000,[^{}]*?"""" + k + """":(-?[0-9][0-9.eE+-]*)""").r
          .findFirstMatchIn(priorText).map(m => k -> m.group(1).toDouble)
      }.toMap)
      .map { case (k, v) =>
        (if (k.contains('@')) k else s"$k@1000000") -> v
      }

  /** Drift predicate shared by the query and harness passes: >1.5x the
    * prior reading, above 1s, and +0.5s absolute (sub-second jitter is
    * not drift). */
  def drifted(prior: Option[Double], now: Double): Boolean =
    prior.exists(p => p > 0 && now > 1.5 * p && now > 1.0 && now - p > 0.5)

  /** A run whose median reading-vs-prior ratio exceeds this is
    * CONTENDED: its readings are host weather, not code, and must not
    * become baselines (r11: the driver's window ran every query at
    * median 1.9x / p95 9.9x with untouched operator code). */
  val MaxQuietRatio = 1.3

  /** Median of this run's reading/prior ratios over the comparable
    * entries (priors above measurement noise); 1.0 when fewer than 3
    * are comparable — too little evidence to call the host contended. */
  def contentionRatio(prior: Map[String, Double],
      now: Map[String, Double]): Double = {
    val rs = now.toSeq
      .flatMap { case (k, v) => prior.get(k).filter(_ > 0.05).map(v / _) }
      .sorted
    if (rs.size < 3) 1.0 else rs(rs.size / 2)
  }

  /** Per-entry raise protection, applied to `now` BEFORE
    * [[mergePriors]]: an entry whose reading [[drifted]] past its
    * prior may only raise the baseline when its key is in `confirmed`
    * (an in-run best-of-2 re-measure stood by the reading); otherwise
    * the old prior wins. Run-level contention gating alone misses
    * this case — a run quiet by median still randomly starves single
    * readings on this host (q66 39.1s vs 4.2s prior, mst@1M 72.2s vs
    * 25.3s, both inside not-contended runs). */
  def protectRaises(prior: Map[String, Double], now: Map[String, Double],
      confirmed: Set[String] = Set.empty): Map[String, Double] =
    now.map { case (k, v) =>
      if (drifted(prior.get(k), v) && !confirmed(k))
        k -> math.min(prior(k), v)
      else k -> v
    }

  /** Next round's baseline map (r11 verdict item 2). A QUIET run's
    * final readings become the new baselines (the drift guard already
    * re-measured anything that looked starved, so a genuine
    * regression is flagged exactly once and then accepted). A
    * CONTENDED run can only LOWER a prior, never raise one — r11's
    * official window would otherwise have shipped q203=172.3s as the
    * baseline and blinded the guard to every future regression under
    * 35x. Entries missing from `now` (budget-skipped or capped
    * queries) carry their old prior forward. */
  def mergePriors(prior: Map[String, Double], now: Map[String, Double],
      contended: Boolean): Map[String, Double] =
    (prior.keySet ++ now.keySet).iterator.map { k =>
      val merged = (prior.get(k), now.get(k)) match {
        case (Some(p), Some(n)) => if (contended) math.min(p, n) else n
        case (Some(p), None) => p
        case (None, Some(n)) => n
        case _ => 0.0 // unreachable: k is drawn from the union
      }
      k -> merged
    }.toMap
}
