package graft

/** Cross-point starvation guard for the scale harnesses (r9 verdict
  * item 3). Each harness already measures every point best-of-2, but
  * back-to-back runs sit inside one host-contention window when the
  * starvation is sustained — r9's substring 1M shipped 184.8s (3.1x
  * its prior-round value, code untouched) with best-of-2 agreeing,
  * while the SAME bench pass recorded a 61.9s brute-KNN first run
  * re-measured to 4.7s. The tell best-of-2 can't see is the IMPLIED
  * EXPONENT: every op in these harnesses is designed ~linear, so the
  * biggest point reading more than `Factor`·sqrt(rowsRatio) times its
  * smaller twin (12.6x for a 10x-rows step, vs ~10x for purely linear
  * work) is either sustained starvation or a real cliff. One extra
  * re-measure separates the two: starvation re-reads low and the
  * harness's `merged` records the inflated first run in its
  * `first_run` audit field; a cliff reproduces and stands.
  */
object ScaleGuard {
  val Factor = 4.0

  /** True when tBig over tSmall implies super-linear blow-up beyond
    * Factor x the sqrt of the rows ratio (and isn't sub-second jitter). */
  def flagged(nBig: Long, tBig: Double, nSmall: Long, tSmall: Double): Boolean =
    nSmall > 0 && nBig > nSmall && tSmall > 0 && tBig > 1.0 &&
      tBig / tSmall > Factor * math.sqrt(nBig.toDouble / nSmall)

  /** Guard the LAST (biggest) point of a harness's point sequence:
    * when its key metric `t` is flagged against the previous point,
    * re-measure once via `redo` and fold with the harness's `merge`
    * (per-metric minima + first-run audit). */
  def apply[P](pts: Seq[P])(n: P => Long, t: P => Double)(
      redo: Long => P, merge: (P, P) => P): Seq[P] =
    if (pts.size < 2) pts
    else {
      val big = pts.last
      val small = pts(pts.size - 2)
      if (!flagged(n(big), t(big), n(small), t(small))) pts
      else pts.init :+ merge(big, redo(n(big)))
    }
}
