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

  test("3k-node point: all four planted checks hold") {
    val p = GraphScaleBench.runPoint(spark, 3000L)
    assert(p.edges == 6000L)
    assert(p.triOk, "triangle count must equal n exactly")
    assert(p.ccOk, "hub components must equal n/1000 exactly")
    assert(p.prOk, "PageRank mass conservation / uniformity failed")
    assert(p.lpaOk, "an LPA label escaped its cluster")
  }
}
