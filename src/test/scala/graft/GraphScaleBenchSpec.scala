package graft

import org.apache.spark.sql.functions._

/** The graph_scale harness pinned small: the generators' planted
  * ground truth (one triangle per node on ring+chord; one component
  * per 1000-node hub cluster), the exact checks the bench gates on,
  * and generator determinism. */
@Slow
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

  test("core+tail: degree census matches the planted construction") {
    val e = GraphScaleBench.coreTailEdges(spark, 3000L)
    // per cluster: 1800 ring + 100 chain undirected edges
    assert(e.count() == 3 * 1900L)
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").count().groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 880 plain ring nodes deg 4, 20 anchors deg 5, 80 chain interior
    // deg 2, 20 chain ends deg 1 — per cluster
    assert(deg == Map(4L -> 2640L, 5L -> 60L, 2L -> 240L, 1L -> 60L),
      deg.toString)
  }

  test("noise-guard merge: per-metric min, ANDed flags, auditable first run") {
    import GraphScaleBench.Point
    val slow = Point(1000L, 2000L, 1.0, 9.0, true, 2.0, true, 3.0, true,
      4.0, true, 5.0, true, 6.0, true)
    val fast = Point(1000L, 2000L, 0.5, 2.0, true, 2.1, true, 2.5, true,
      4.1, false, 4.5, true, 6.2, true)
    val m = GraphScaleBench.merged(slow, fast)
    assert(m.triSec == 2.0 && m.ccSec == 2.0 && m.prSec == 2.5
      && m.lpaSec == 4.0 && m.kcSec == 4.5 && m.lpdSec == 6.0,
      "every metric keeps the minimum")
    assert(!m.lpaOk, "a failed invariant in EITHER run must survive")
    assert(m.first.contains(slow),
      "a >1.3x disagreement keeps the first run auditable")
    // a noisy NEW metric alone also triggers the audit blob
    val kcNoisy = GraphScaleBench.merged(fast.copy(lpaOk = true,
      kcSec = 9.0), fast.copy(lpaOk = true))
    assert(kcNoisy.first.nonEmpty && kcNoisy.kcSec == 4.5)
    // quiet pair: no audit blob
    val q = GraphScaleBench.merged(fast.copy(lpaOk = true),
      fast.copy(lpaOk = true))
    assert(q.first.isEmpty && q.allOk)
  }

  test("3k-node point: all eight planted checks hold") {
    val p = GraphScaleBench.runPoint(spark, 3000L)
    assert(p.edges == 6000L)
    assert(p.triOk, "triangle count must equal n exactly")
    assert(p.ccOk, "hub components must equal n/1000 exactly")
    assert(p.prOk, "PageRank mass conservation / uniformity failed")
    assert(p.lpaOk, "an LPA label escaped its cluster")
    assert(p.kcOk, "k-core planted core/depth checks failed")
    assert(p.lpdOk, "link-prediction planted candidate census failed")
    assert(p.mstOk,
      "MSF planted ring-tree (count/weight/checksum/flags) failed")
    assert(p.pprOk,
      "PPR disconnected-cluster containment / symmetry failed")
  }
}
