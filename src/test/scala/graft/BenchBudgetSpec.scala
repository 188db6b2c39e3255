package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r10 driver bench timed out (rc=124, parsed:null) — BenchBudget
  * is the fix: every expensive block is gated on a twin-predicted
  * estimate and skipped-with-record when it doesn't fit. These tests
  * pin the gate's arithmetic without Spark. */
class BenchBudgetSpec extends AnyFunSuite {

  private def budgetWith(remaining: Double): BenchBudget =
    new BenchBudget(System.nanoTime(), remaining)

  test("fits: true inside the window, false outside, skip recorded") {
    val b = budgetWith(100.0)
    assert(b.fits("small", 10.0))
    assert(b.skipped.isEmpty)
    assert(!b.fits("huge", 1000.0))
    assert(b.skipped == Seq("huge"))
  }

  test("fits honors the emit reserve") {
    val b = budgetWith(30.0)
    // 30s left, 15s reserve: a 20s block must NOT fit
    assert(!b.fits("block", 20.0))
    assert(b.fits("fine", 10.0))
  }

  test("unlimited budget never skips") {
    val b = BenchBudget.unlimited
    assert(b.fits("anything", 1e12))
    assert(b.skipped.isEmpty)
  }

  test("gatedPoints: all points run when the budget allows") {
    val b = budgetWith(1000.0)
    val ran = scala.collection.mutable.ArrayBuffer.empty[Long]
    val pts = BenchBudget.gatedPoints(b, "fam", Seq(10L, 100L),
      firstEst = 1.0)(n => { ran += n; (n, 0.5) })(_._1, _._2)
    assert(pts.map(_._1) == Seq(10L, 100L) && ran.toSeq == Seq(10L, 100L))
    assert(b.skipped.isEmpty)
  }

  test("gatedPoints: big point skipped when twin-predicted cost " +
      "exceeds the window, and the skip is recorded by name") {
    val b = budgetWith(40.0)
    // small point reads 10s; linear est for 10x rows = 100s*margin —
    // doesn't fit 40s; the small point itself must still have run
    val pts = BenchBudget.gatedPoints(b, "sub", Seq(100L, 1000L),
      firstEst = 5.0)(n => (n, if (n == 100L) 10.0 else 999.0))(
      _._1, _._2)
    assert(pts.map(_._1) == Seq(100L))
    assert(b.skipped == Seq("sub_1000"))
  }

  test("gatedPoints: fixedEst overrides pessimistic linear " +
      "extrapolation (sub-linear harness wall)") {
    val b = budgetWith(100.0)
    // linear est from the 30s small point would be 300s (skip);
    // the measured table knows the big point costs ~60s (fits)
    val pts = BenchBudget.gatedPoints(b, "graph", Seq(100L, 1000L),
      firstEst = 5.0, fixedEst = Map(100L -> 30.0, 1000L -> 60.0))(
      n => (n, if (n == 100L) 30.0 else 55.0))(_._1, _._2)
    assert(pts.map(_._1) == Seq(100L, 1000L))
    assert(b.skipped.isEmpty)
  }

  test("gatedPoints: calibration scales fixed estimates up on a " +
      "slow host") {
    val b = budgetWith(100.0)
    // small point measures 3x its table entry -> calib 3 -> big-point
    // est 3*40=120 > 85 remaining-with-reserve -> skipped
    val pts = BenchBudget.gatedPoints(b, "v", Seq(100L, 1000L),
      firstEst = 5.0, fixedEst = Map(100L -> 10.0, 1000L -> 40.0))(
      n => (n, 30.0))(_._1, _._2)
    assert(pts.map(_._1) == Seq(100L))
    assert(b.skipped == Seq("v_1000"))
  }

  test("gatedGuard: flagged big point re-measures when it fits, " +
      "ships as-is (skip recorded) when it doesn't") {
    // two points with an implied exponent past ScaleGuard.Factor:
    // 100 -> 1.0s, 1000 -> 50s (ratio 50 > 4*sqrt(10))
    val pts = Seq((100L, 1.0), (1000L, 50.0))
    var redone = 0
    val fit = budgetWith(500.0)
    val r1 = BenchBudget.gatedGuard(fit, "fam", pts)(_._1, _._2)(
      n => { redone += 1; (n, 2.0) }, (a, b) => (a._1, math.min(a._2, b._2)))
    assert(redone == 1 && r1.last._2 == 2.0)
    val tight = budgetWith(20.0)
    val r2 = BenchBudget.gatedGuard(tight, "fam", pts)(_._1, _._2)(
      n => { redone += 1; (n, 2.0) }, (a, b) => (a._1, math.min(a._2, b._2)))
    assert(redone == 1) // no second re-measure: gated out
    assert(r2.last._2 == 50.0) // ships as measured
    assert(tight.skipped == Seq("fam_guard_1000"))
  }

  test("gatedPoints: seed points head the result, feed the linear " +
      "estimate, and calibrate fixed estimates (harness floor split)") {
    val b = budgetWith(100.0)
    val ran = scala.collection.mutable.ArrayBuffer.empty[Long]
    // floor already measured the 100-point at 10s; the rest call runs
    // only the 1000-point, estimating from the seed (10s * 10x * 1.6
    // = 160s — too big) unless the fixed table allows it
    val pts = BenchBudget.gatedPoints(b, "fam", Seq(1000L),
      firstEst = 5.0, fixedEst = Map(100L -> 10.0, 1000L -> 50.0),
      seed = Seq((100L, 10.0)))(n => { ran += n; (n, 45.0) })(_._1, _._2)
    assert(pts == Seq((100L, 10.0), (1000L, 45.0)), "seed heads the curve")
    assert(ran.toSeq == Seq(1000L), "seed sizes are not re-run")
    // seed calibration: floor read 30s vs table 10.0 -> calib 3 ->
    // big est 3*50=150 > window -> skip, seed still returned
    val tight = budgetWith(100.0)
    val pts2 = BenchBudget.gatedPoints(tight, "fam", Seq(1000L),
      firstEst = 5.0, fixedEst = Map(100L -> 10.0, 1000L -> 50.0),
      seed = Seq((100L, 30.0)))(n => (n, 45.0))(_._1, _._2)
    assert(pts2 == Seq((100L, 30.0)))
    assert(tight.skipped == Seq("fam_1000"))
  }

  test("pointCapSec: 3x estimate, floored at 30s, ceiling at 300s") {
    assert(BenchBudget.pointCapSec(2.0) == 30.0)
    assert(BenchBudget.pointCapSec(20.0) == 60.0)
    assert(BenchBudget.pointCapSec(200.0) == 300.0)
  }

  test("gatedPoints: a capped point is recorded <fam>_<n>_capped and " +
      "the family continues with its remaining sizes") {
    val b = budgetWith(1000.0)
    b.capper = Some(new BenchBudget.Capper {
      def apply[P](tag: String, capSec: Double)(body: => P): Option[P] =
        if (tag == "fam_100") None else Some(body)
    })
    val pts = BenchBudget.gatedPoints(b, "fam", Seq(100L, 1000L),
      firstEst = 1.0)(n => (n, 0.5))(_._1, _._2)
    assert(pts.map(_._1) == Seq(1000L))
    assert(b.skipped == Seq("fam_100_capped"))
  }

  test("gatedPoints: a genuine in-cap failure is rethrown through the " +
      "capper (section fail-loud markers keep working)") {
    val b = budgetWith(1000.0)
    b.capper = Some(new BenchBudget.Capper {
      def apply[P](tag: String, capSec: Double)(body: => P): Option[P] =
        Some(body)
    })
    intercept[RuntimeException] {
      BenchBudget.gatedPoints(b, "fam", Seq(100L), firstEst = 1.0)(
        n => sys.error("boom"): (Long, Double))(_._1, _._2)
    }
  }

  test("gatedGuard: a capped re-measure ships the original point and " +
      "records <fam>_guard_<n>_capped") {
    val b = budgetWith(500.0)
    b.capper = Some(new BenchBudget.Capper {
      def apply[P](tag: String, capSec: Double)(body: => P): Option[P] =
        None // every redo is 'cancelled'
    })
    val pts = Seq((100L, 1.0), (1000L, 50.0)) // flagged (exp > 4*sqrt(10))
    val r = BenchBudget.gatedGuard(b, "fam", pts)(_._1, _._2)(
      n => (n, 2.0), (a, x) => (a._1, math.min(a._2, x._2)))
    assert(r.last._2 == 50.0, "original reading ships when the redo caps")
    assert(b.skipped.contains("fam_guard_1000_capped"))
  }

  test("floor reserve: held out of every fits call, released " +
      "share-by-share, clamped at zero") {
    val b = budgetWith(200.0)
    b.addReserve(150.0)
    assert(!b.fits("main_big", 50.0)) // 200 - 15 - 150 = 35 < 50
    assert(b.fits("main_small", 30.0))
    b.releaseReserve(100.0)
    assert(b.fits("floor1", 80.0)) // 200 - 15 - 50 = 135 >= 80
    b.releaseReserve(100.0) // over-release clamps
    assert(b.reservedSec == 0.0)
  }

  test("floor reserve covers all four family floors at quiet-host " +
      "cost inside a 900s window (r12 verdict item 3: >=1 headline " +
      "point per family)") {
    val shares = Bench.FloorReserve.toMap
    assert(shares.keySet == Set("vector", "graph", "stream", "text"))
    // the harnesses' own quiet-host fixedEst floor costs (vector 10k
    // = 6s, graph 100k = 32s, stream 200k = 35s, text 100k = 10+8+8+4
    // = 30s across its four sub-families) — each share must cover its
    // floor with >=25% headroom so the floor's OWN inner gates accept
    // it on a mildly slow host...
    val floorCost = Map("vector" -> 6.0, "graph" -> 32.0,
      "stream" -> 35.0, "text" -> 30.0)
    floorCost.foreach { case (f, c) =>
      assert(shares(f) >= 1.25 * c, s"$f share ${shares(f)} vs cost $c")
    }
    // ...and the whole reserve must stay a modest fraction of the
    // 900s driver window, or reserving it would itself starve the
    // main pass it is protecting the floors FROM
    assert(shares.values.sum <= 0.25 * 900.0)
  }

  test("gatedGuard: unflagged curve is untouched") {
    val pts = Seq((100L, 1.0), (1000L, 8.0)) // ~linear, no flag
    var redone = 0
    val r = BenchBudget.gatedGuard(budgetWith(500.0), "fam", pts)(
      _._1, _._2)(n => { redone += 1; (n, 1.0) },
      (a, _) => a)
    assert(redone == 0 && r == pts)
  }
}
