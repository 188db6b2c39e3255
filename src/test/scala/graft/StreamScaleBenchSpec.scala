package graft

/** Pins the streaming scale harness itself at a tiny point: the three
  * planted invariants (closed-form session census, exact dedup
  * survivor count, exact window mass) must hold end-to-end through
  * real micro-batched streaming queries, and the noise-guard merge
  * must keep per-metric minima, AND flags, and retain an inflated
  * first run for audit. */
@Slow
class StreamScaleBenchSpec extends SparkSpecBase {

  test("2k-event point: all three planted stream checks hold") {
    val p = StreamScaleBench.runPoint(spark, 2000L, attempt = 1)
    assert(p.sesOk, "sessionization census")
    assert(p.dedupOk, "dedup survivor count")
    assert(p.winOk, "window mass census")
    assert(p.allOk)
  }

  test("noise-guard merge: per-metric min, ANDed flags, auditable first") {
    val a = StreamScaleBench.Point(1000L, 1.0, 5.0, true, 1.0, true,
      2.0, true)
    val b = StreamScaleBench.Point(1000L, 1.2, 2.0, true, 1.1, false,
      2.1, true)
    val m = StreamScaleBench.merged(a, b)
    assert(m.sesSec == 2.0 && m.dedupSec == 1.0 && m.winSec == 2.0)
    assert(!m.dedupOk && m.sesOk && m.winOk)
    // ses disagreed by 2.5x -> the first run is kept for audit
    assert(m.first.contains(a.copy()))
    // agreement within 1.3x -> no first_run carried
    val c = StreamScaleBench.Point(1000L, 1.0, 2.2, true, 1.05, true,
      2.05, true)
    assert(StreamScaleBench.merged(c, b.copy(dedupOk = true))
      .first.isEmpty)
  }
}
