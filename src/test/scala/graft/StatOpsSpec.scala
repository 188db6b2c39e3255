package graft

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
}
