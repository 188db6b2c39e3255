package graft

/** Wall-clock budget for [[Bench]] and the scale harnesses (r10
  * verdict items 1–4): the r10 driver bench timed out (rc=124,
  * `parsed: null`) because the suite's quiet-host floor outgrew the
  * driver's window and nothing inside the bench could notice. Every
  * expensive block now asks `fits(what, estSec)` before running —
  * the estimate extrapolated from the block's own smaller twin — and
  * a block that doesn't fit is SKIPPED AND RECORDED in the artifact
  * (`"skipped":[...]`) instead of silently eating the window.
  *
  * Two r12-verdict additions:
  *  - [[Capper]]: a per-point job-group cap the owning run wires in,
  *    so EVERY measured section (harness floors, harness rest points,
  *    guard re-measures) is bounded the way the main pass already
  *    was — r12's artifact lost 3 of 4 family floors to a single
  *    56.8s uncapped sf0.01 reading.
  *  - the floor reserve ([[addReserve]]/[[releaseReserve]]): wall
  *    held back from every earlier `fits` so the per-family harness
  *    floors are guaranteed their window; each floor releases its
  *    share right before running.
  *
  * Thread-safe: the skip list is concurrent because the Bench
  * watchdog thread reads it while the main thread appends.
  */
final class BenchBudget(t0Nanos: Long, val deadlineSec: Double) {
  private val skippedQ = new java.util.concurrent.ConcurrentLinkedQueue[String]

  /** Per-point cap runner, wired by Bench (None in specs/iteration):
    * [[BenchBudget.gatedPoints]] and [[BenchBudget.gatedGuard]] run
    * each point through it so a starved harness point is CANCELLED at
    * its cap and recorded skipped instead of eating the window. */
  @volatile var capper: Option[BenchBudget.Capper] = None

  /** Extra wall held back from `fits` on top of the emit reserve —
    * the floor-reserve mechanism (r12 verdict item 1/3: the family
    * floors must survive a contended main pass; reserving their
    * estimated wall makes that arithmetic, not hope). */
  @volatile private var extraReserveSec: Double = 0.0
  def addReserve(sec: Double): Unit = synchronized {
    extraReserveSec += sec
  }
  def releaseReserve(sec: Double): Unit = synchronized {
    extraReserveSec = math.max(0.0, extraReserveSec - sec)
  }
  def reservedSec: Double = extraReserveSec

  def elapsedSec: Double = (System.nanoTime() - t0Nanos) / 1e9
  def remainingSec: Double = deadlineSec - elapsedSec

  /** True when `estSec` fits in the remaining budget with `reserveSec`
    * (plus any outstanding floor reserve) left over for the emit path;
    * false records `what` as skipped. */
  def fits(what: String, estSec: Double, reserveSec: Double = 15.0): Boolean = {
    val ok = remainingSec - reserveSec - extraReserveSec >= estSec
    if (!ok) skippedQ.add(what)
    ok
  }

  def skip(what: String): Unit = skippedQ.add(what)

  def skipped: Seq[String] = {
    import scala.jdk.CollectionConverters._
    skippedQ.iterator().asScala.toSeq
  }
}

object BenchBudget {
  /** No deadline: every `fits` is true (specs, iteration). */
  def unlimited: BenchBudget =
    new BenchBudget(System.nanoTime(), Double.MaxValue)

  /** The per-point job-group cap contract (r12 verdict item 1).
    * `apply` returns Some(result) on an in-cap completion and None
    * when the cap fired (the point's jobs were cancelled, or it
    * completed past the cap — either way the reading is starved
    * beyond what the cap deems usable); a GENUINE failure — an
    * exception raised well under the cap — is rethrown so the
    * section-level fail-loud markers keep working. */
  trait Capper {
    def apply[P](tag: String, capSec: Double)(body: => P): Option[P]
  }

  /** Cap for a harness point whose cost estimate is `estSec`: 3×
    * headroom over the (calibration-scaled) estimate tolerates a
    * moderately slow host, the 30s floor keeps small points from
    * being cancelled on sub-second jitter, and 300s bounds the worst
    * case a single point can cost the window. */
  def pointCapSec(estSec: Double): Double =
    math.min(math.max(3.0 * estSec, 30.0), 300.0)

  /** Run `f` at each size in ascending order, gating every point on a
    * cost estimate — the r10-verdict prescription for the 47–534 s
    * substring-1M tail: the small twin predicts the big point, and a
    * point that doesn't fit is skipped and recorded
    * (`<fam>_<size>`). Estimation, in preference order:
    *
    *  1. `fixedEst(size) × calib` when the harness ships a measured
    *     default-size cost table. Harness wall is strongly
    *     SUB-linear in rows (fixed overhead + better slot
    *     amortization at 1M), so naive linear extrapolation
    *     over-predicts big points 3–7× and would skip work that
    *     fits; the table encodes real quiet-host readings. `calib`
    *     (≥1) is the observed slowdown of THIS run's completed
    *     points vs their table entries — a contended host scales
    *     every later estimate up with the evidence.
    *  2. Otherwise linear extrapolation from the previous completed
    *     point × `margin` (a conservative upper bound for the
    *     designed-linear ops measured here).
    *  3. The first point of a family has no twin: `firstEst`.
    *
    * `seed` carries points already measured earlier in the run (the
    * r11-verdict reserved harness floor runs each family's smallest
    * point AHEAD of the main-pass tail; the full section later runs
    * the remaining sizes with the floor as seed) — seed points feed
    * the estimates and the calibration AND are returned at the head
    * of the result, so the caller's Result carries the whole curve.
    *
    * When `budget.capper` is wired (Bench does), each point runs
    * inside its own job-group cap at [[pointCapSec]] of its estimate:
    * a cancelled point is recorded `<fam>_<size>_capped` and the
    * family continues with its remaining sizes — r12 lost three
    * family floors to ONE uncapped starved reading upstream of them.
    */
  def gatedPoints[P](budget: BenchBudget, fam: String, sizes: Seq[Long],
      firstEst: Double, margin: Double = 1.6,
      fixedEst: Map[Long, Double] = Map.empty, seed: Seq[P] = Seq.empty)(
      f: Long => P)(n: P => Long, t: P => Double): Seq[P] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[P]
    acc ++= seed
    var calib = 1.0
    acc.foreach { p =>
      fixedEst.get(n(p)).filter(_ > 0).foreach { fe =>
        calib = math.max(calib, math.max(1.0, t(p) / fe))
      }
    }
    sizes.foreach { s =>
      val linear = acc.lastOption
        .map(p => t(p) * (s.toDouble / n(p)) * margin)
        .getOrElse(firstEst)
      val est = fixedEst.get(s).map(_ * calib).getOrElse(linear)
      if (budget.fits(s"${fam}_$s", est)) {
        val ran: Option[P] = budget.capper match {
          case Some(c) => c(s"${fam}_$s", pointCapSec(est))(f(s))
          case None => Some(f(s))
        }
        ran match {
          case Some(p) =>
            acc += p
            fixedEst.get(s).filter(_ > 0).foreach { fe =>
              calib = math.max(calib, math.max(1.0, t(p) / fe))
            }
          case None => budget.skip(s"${fam}_${s}_capped")
        }
      }
    }
    acc.toSeq
  }

  /** [[ScaleGuard]] with the re-measure itself budget-gated AND
    * capped: a flagged big point whose re-run doesn't fit the
    * remaining window ships as-is (recorded `<fam>_guard_<size>`
    * skipped), and one whose re-run hits its own cap ships the
    * original reading (recorded `<fam>_guard_<size>_capped`) — the
    * guard must never be the thing that blows the driver's
    * deadline. */
  def gatedGuard[P](budget: BenchBudget, fam: String, pts: Seq[P])(
      n: P => Long, t: P => Double)(
      redo: Long => P, merge: (P, P) => P): Seq[P] =
    ScaleGuard(pts)(n, t)({ nn =>
      val big = pts.last
      if (budget.fits(s"${fam}_guard_$nn", t(big) * 1.2)) {
        budget.capper match {
          case Some(c) =>
            c(s"${fam}_guard_$nn", pointCapSec(t(big)))(redo(nn))
              .getOrElse {
                budget.skip(s"${fam}_guard_${nn}_capped")
                big
              }
          case None => redo(nn)
        }
      } else big
    }, merge)
}
