package graft

/** Prior-round bench-artifact parsing for the cross-round drift guard
  * (r9 verdict item 2). The detail artifact is JSON this program
  * itself emits, so the extraction is two stable shapes: the flat
  * `"queries":{...}` / `"headline_metrics":{...}` maps, and (for
  * pre-r10 artifacts that lack the flat headline map) n-anchored
  * lookups inside the nested harness point blocks. */
object DriftBaseline {
  private val numPair = """"([^"]+)":(-?[0-9][0-9.eE+-]*)""".r

  private[graft] def flatMapOf(block: String): Map[String, Double] =
    numPair.findAllMatchIn(block).map(m =>
      m.group(1) -> m.group(2).toDouble).toMap

  /** The per-query seconds map from a prior detail artifact. */
  def queriesOf(priorText: String): Map[String, Double] =
    """"queries":\{([^}]*)\}""".r.findFirstMatchIn(priorText)
      .map(m => flatMapOf(m.group(1))).getOrElse(Map.empty)

  /** The biggest-point metrics every harness headline rests on. */
  val HeadlineKeys: Seq[String] = Seq("lsh_sec", "sub_sec", "tri_sec",
    "pr_sec", "kcore_sec", "mst_sec", "session_sec", "brute_sec")

  /** Harness headline metrics from a prior detail artifact: the flat
    * `headline_metrics` map when present (r10+), else the metric's
    * first occurrence inside an `"n":1000000` point block — every
    * pre-r10 point json leads with its `n` and keeps these keys
    * before any nested `first_run` object, so `[^{}]*?` cannot cross
    * a block boundary. */
  def headlineOf(priorText: String): Map[String, Double] =
    """"headline_metrics":\{([^}]*)\}""".r.findFirstMatchIn(priorText)
      .map(m => flatMapOf(m.group(1)))
      .getOrElse(HeadlineKeys.flatMap { k =>
        (""""n":1000000,[^{}]*?"""" + k + """":(-?[0-9][0-9.eE+-]*)""").r
          .findFirstMatchIn(priorText).map(m => k -> m.group(1).toDouble)
      }.toMap)

  /** Drift predicate shared by the query and harness passes: >1.5x the
    * prior reading, above 1s, and +0.5s absolute (sub-second jitter is
    * not drift). */
  def drifted(prior: Option[Double], now: Double): Boolean =
    prior.exists(p => p > 0 && now > 1.5 * p && now > 1.0 && now - p > 0.5)
}
