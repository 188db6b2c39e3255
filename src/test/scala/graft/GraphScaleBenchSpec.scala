package graft

import org.apache.spark.sql.functions._

/** The graph_scale harness pinned small: the generators' planted
  * ground truth (one triangle per node on ring+chord; one component
  * per 1000-node hub cluster), the exact checks the bench gates on,
  * and generator determinism. */
class GraphScaleBenchSpec extends SparkSpecBase {

  test("ring+chord: exactly one triangle per node; 4-regular") {
    val e = GraphScaleBench.ringChordEdges(spark, 3000L)
    assert(e.count() == 6000L) // 2 undirected edges per node
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").count()
    assert(deg.filter(col("count") =!= 4).count() == 0, "must be 4-regular")
    // no edge crosses a cluster boundary
    assert(e.filter(col("u") / 1000 =!= col("v") / 1000)
      .filter((col("u") / 1000).cast("long")
        =!= (col("v") / 1000).cast("long")).count() == 0)
  }

  test("noise-guard merge: per-metric min, ANDed flags, auditable first run") {
    import GraphScaleBench.Point
    val slow = Point(1000L, 2000L, 1.0, 9.0, true, 2.0, true, 3.0, true,
      4.0, true)
    val fast = Point(1000L, 2000L, 0.5, 2.0, true, 2.1, true, 2.5, true,
      4.1, false)
    val m = GraphScaleBench.merged(slow, fast)
    assert(m.triSec == 2.0 && m.ccSec == 2.0 && m.prSec == 2.5
      && m.lpaSec == 4.0, "every metric keeps the minimum")
    assert(!m.lpaOk, "a failed invariant in EITHER run must survive")
    assert(m.first.contains(slow),
      "a >1.3x disagreement keeps the first run auditable")
    // quiet pair: no audit blob
    val q = GraphScaleBench.merged(fast.copy(lpaOk = true),
      fast.copy(lpaOk = true))
    assert(q.first.isEmpty && q.allOk)
  }

  test("3k-node point: all four planted checks hold") {
    val p = GraphScaleBench.runPoint(spark, 3000L)
    assert(p.edges == 6000L)
    assert(p.triOk, "triangle count must equal n exactly")
    assert(p.ccOk, "hub components must equal n/1000 exactly")
    assert(p.prOk, "PageRank mass conservation / uniformity failed")
    assert(p.lpaOk, "an LPA label escaped its cluster")
  }
}
