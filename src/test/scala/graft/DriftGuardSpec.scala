package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-round drift guard's parsing and flag logic (r9
  * verdict items 2 and 3) against the REAL artifact shapes: a pre-r10
  * nested detail json (no flat headline map) and the r10+ flat one. */
class DriftGuardSpec extends AnyFunSuite {

  private val preR10 =
    """{"metric":"total","value":178.8,"unit":"sec",""" +
      """"queries":{"q110_pagerank":5.406,"q125_triangle_count":5.703},""" +
      """"text_scale":{"points":[""" +
      """{"n":100000,"gen_sec":0.2,"lsh_sec":3.725,"candidate_pairs":1000},""" +
      """{"n":1000000,"gen_sec":0.4,"lsh_sec":12.774,"candidate_pairs":10000}],""" +
      """"substring":[{"n":100000,"sub_sec":4.0,"pairs_found":1000},""" +
      """{"n":1000000,"sub_sec":184.827,"pairs_found":10000}]},""" +
      """"graph_scale":{"points":[{"n":1000000,"edges":2000000,""" +
      """"gen_sec":1.0,"tri_sec":3.854,"triangles_ok":true,"cc_sec":9.0,""" +
      """"pr_sec":9.787,"kcore_sec":9.4,"mst_sec":21.9,"mst_ok":true,""" +
      """"first_run":{"n":1000000,"tri_sec":11.2,"pr_sec":30.0}}]},""" +
      """"stream_scale":{"points":[{"n":1000000,"parts":8,"gen_sec":2.0,""" +
      """"session_sec":30.147,"sessions_ok":true}]},""" +
      """"vector_scale":{"points":[{"n":1000000,"gen_sec":1.0,""" +
      """"brute_sec":4.733,"indexes":{"hnsw":{"build_sec":34.1}}}]},""" +
      """"sf":"/root/testdata/sf0.1"}"""

  test("queriesOf extracts the flat per-query map") {
    val q = DriftBaseline.queriesOf(preR10)
    assert(q == Map("q110_pagerank" -> 5.406, "q125_triangle_count" -> 5.703))
  }

  test("headlineOf falls back to n-anchored extraction on pre-r10 " +
      "shape, normalizing plain keys to @1000000") {
    val h = DriftBaseline.headlineOf(preR10)
    assert(h("sub_sec@1000000") == 184.827)
    assert(h("lsh_sec@1000000") == 12.774)
    // the point value, NOT first_run's 11.2
    assert(h("tri_sec@1000000") == 3.854)
    assert(h("pr_sec@1000000") == 9.787)
    assert(h("kcore_sec@1000000") == 9.4)
    assert(h("mst_sec@1000000") == 21.9)
    assert(h("session_sec@1000000") == 30.147)
    assert(h("brute_sec@1000000") == 4.733)
  }

  test("headlineOf prefers the flat headline_metrics map when present; " +
      "r12 @n keys pass through unchanged") {
    val flat = preR10.dropRight(1) +
      ""","headline_metrics":{"sub_sec":60.4,"lsh_sec@100000":3.7}}"""
    val h = DriftBaseline.headlineOf(flat)
    assert(h == Map("sub_sec@1000000" -> 60.4, "lsh_sec@100000" -> 3.7))
  }

  test("queriesOf/headlineOf are empty on a missing artifact") {
    assert(DriftBaseline.queriesOf("") == Map.empty[String, Double])
    assert(DriftBaseline.headlineOf("") == Map.empty[String, Double])
  }

  test("drifted: the r9 substring regression flags; jitter does not") {
    // 60.4 -> 184.8 with untouched code: the reading that motivated this
    assert(DriftBaseline.drifted(Some(60.4), 184.8))
    assert(!DriftBaseline.drifted(Some(60.4), 80.0)) // < 1.5x
    assert(!DriftBaseline.drifted(Some(0.3), 0.9)) // sub-second
    assert(!DriftBaseline.drifted(Some(0.9), 1.39)) // +0.49s absolute
    assert(!DriftBaseline.drifted(None, 100.0)) // no baseline
    assert(!DriftBaseline.drifted(Some(0.0), 5.0)) // degenerate prior
  }

  test("queriesOf prefers the min-merged priors map when present") {
    val withPriors = preR10.dropRight(1) +
      ""","priors":{"q110_pagerank":4.2,"q203_sssp":4.91}}"""
    assert(DriftBaseline.queriesOf(withPriors) ==
      Map("q110_pagerank" -> 4.2, "q203_sssp" -> 4.91))
    // an empty priors map (first run with the field) falls back to the
    // run's own readings
    val emptyPriors = preR10.dropRight(1) + ""","priors":{}}"""
    assert(DriftBaseline.queriesOf(emptyPriors)
      .contains("q110_pagerank"))
    // headline_priors must not shadow-match the "priors" regex
    val hl = preR10.dropRight(1) +
      ""","headline_priors":{"sub_sec":60.0}}"""
    assert(DriftBaseline.queriesOf(hl) ==
      Map("q110_pagerank" -> 5.406, "q125_triangle_count" -> 5.703))
    assert(DriftBaseline.headlineOf(hl) ==
      Map("sub_sec@1000000" -> 60.0))
  }

  test("scaleOf: prefers the min-merged scale_priors map, falls back " +
      "to the scale block's small readings, empty otherwise") {
    val withBoth =
      """{"scale":{"small_sf":"/x","small":{"q1":1.5,"q2":0.4},""" +
        """"log10_ratio_for_10x_rows":{"q1":0.9}},""" +
        """"scale_priors":{"q1":1.2}}"""
    assert(DriftBaseline.scaleOf(withBoth) == Map("q1" -> 1.2))
    // the r12 bootstrap shape: only the run's own small readings —
    // and noise_guard's "small_first" key must NOT shadow-match
    val smallOnly =
      """{"scale":{"small_sf":"/x","small":{"q1":1.5,"q2":0.4},""" +
        """"failures":[]},"noise_guard":{"small_first":{"q9":9.0}}}"""
    assert(DriftBaseline.scaleOf(smallOnly) ==
      Map("q1" -> 1.5, "q2" -> 0.4))
    assert(DriftBaseline.scaleOf("{}") == Map.empty)
  }

  test("contentionRatio: median reading-vs-prior; 1.0 under 3 samples") {
    val prior = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0, "d" -> 0.01)
    // d's prior is below the 0.05s comparability floor — excluded
    val now = Map("a" -> 1.9, "b" -> 4.2, "c" -> 4.4, "d" -> 5.0)
    // ratios: 1.9, 2.1, 1.1 -> median 1.9
    assert(DriftBaseline.contentionRatio(prior, now) == 1.9)
    assert(DriftBaseline.contentionRatio(Map("a" -> 1.0),
      Map("a" -> 50.0)) == 1.0) // too little evidence
  }

  test("mergePriors: a CONTENDED run can never raise any prior") {
    // the r11 shape: q203 starved to 172.3s against a 4.91s prior
    val prior = Map("q203" -> 4.91, "q126" -> 2.6, "q22" -> 0.5,
      "skipped_q" -> 1.2)
    val now = Map("q203" -> 172.3, "q126" -> 61.2, "q22" -> 0.4,
      "new_q" -> 3.0)
    val merged = DriftBaseline.mergePriors(prior, now, contended = true)
    assert(merged("q203") == 4.91, "starved reading must not become prior")
    assert(merged("q126") == 2.6)
    assert(merged("q22") == 0.4, "min-merge still LOWERS priors")
    assert(merged("skipped_q") == 1.2, "unmeasured queries carry forward")
    assert(merged("new_q") == 3.0, "first reading is adopted")
    assert(merged.forall { case (k, m) =>
      m <= prior.getOrElse(k, Double.MaxValue) }, "no prior may rise")
  }

  test("protectRaises: a drifted reading may only raise its baseline " +
      "when confirmed by a re-measure") {
    val prior = Map("mst_sec@1000000" -> 25.32, "q66" -> 4.23,
      "q83" -> 0.26)
    val now = Map("mst_sec@1000000" -> 72.16, "q66" -> 6.1,
      "q83" -> 0.29, "fresh" -> 9.0)
    val p = DriftBaseline.protectRaises(prior, now)
    assert(p("mst_sec@1000000") == 25.32,
      "unconfirmed 2.85x jump must not become the baseline")
    assert(p("q66") == 6.1, "1.44x is below the drift threshold: passes")
    assert(p("q83") == 0.29 && p("fresh") == 9.0)
    val c = DriftBaseline.protectRaises(prior, now,
      confirmed = Set("mst_sec@1000000"))
    assert(c("mst_sec@1000000") == 72.16,
      "a best-of-2-confirmed jump is a real regression: adopt it")
  }

  test("mergePriors: a QUIET run's final readings become the baselines") {
    val prior = Map("q1" -> 1.0, "gone" -> 2.0)
    val now = Map("q1" -> 1.2, "q2" -> 0.7)
    val merged = DriftBaseline.mergePriors(prior, now, contended = false)
    assert(merged == Map("q1" -> 1.2, "q2" -> 0.7, "gone" -> 2.0))
  }

  test("ScaleGuard.flagged: implied exponent beyond 4*sqrt(rows ratio)") {
    // r9's substring point: 4.0s @ 100k -> 184.8s @ 1M (46x > 12.6x)
    assert(ScaleGuard.flagged(1000000L, 184.8, 100000L, 4.0))
    // the r8 reading of the same point: 60.4s (15.1x > 12.6x) — also
    // caught, which is the desired sensitivity for designed-linear work
    assert(ScaleGuard.flagged(1000000L, 60.4, 100000L, 4.0))
    // linear scaling passes: 4.0s -> 40s for 10x rows
    assert(!ScaleGuard.flagged(1000000L, 40.0, 100000L, 4.0))
    // sub-second big points never flag (jitter)
    assert(!ScaleGuard.flagged(1000000L, 0.9, 100000L, 0.01))
    // degenerate twins never flag
    assert(!ScaleGuard.flagged(1000000L, 50.0, 0L, 0.0))
    assert(!ScaleGuard.flagged(100000L, 50.0, 100000L, 1.0))
  }

  test("ScaleGuard re-measures only the flagged last point") {
    var redone = 0
    val pts = Seq((100000L, 4.0), (1000000L, 184.8))
    val out = ScaleGuard(pts)(_._1, _._2)(
      n => { redone += 1; (n, 61.0) },
      (a, b) => (a._1, math.min(a._2, b._2)))
    assert(redone == 1)
    assert(out == Seq((100000L, 4.0), (1000000L, 61.0)))
    // an unflagged sequence is returned untouched, no re-run
    val ok = Seq((100000L, 4.0), (1000000L, 40.0))
    val out2 = ScaleGuard(ok)(_._1, _._2)(
      n => { redone += 1; (n, 0.0) }, (a, _) => a)
    assert(redone == 1 && out2 == ok)
  }
}
