package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.operators.RelationalOps

/** Plan-shape assertions — the Spark analogue of the reference SLT
  * `ensure:` directives (sqllogictest.cpp:69-126): assert not just the
  * answer but that Catalyst picked the physical shape we designed for.
  * These are the properties that decide 100TB behavior. */
class PlanShapeSpec extends SparkSpecBase {

  private def planOf(name: String): SparkPlan =
    RelationalOps.queries(name)(spark, sfDir).queryExecution.executedPlan

  private def planString(name: String): String = planOf(name).toString

  test("q03 ORDER BY+LIMIT fuses to TakeOrderedAndProject (TopN)") {
    assert(planString("q03_topn").contains("TakeOrderedAndProject"))
  }

  test("q01 filter is pushed to the parquet scan") {
    val s = planString("q01_scan_filter_project")
    assert(s.contains("PushedFilters: [") && s.contains("GreaterThan"))
  }

  test("q01 scan prunes columns (ReadSchema is the 4-col projection)") {
    val s = planString("q01_scan_filter_project")
    val read = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"))
  }

  test("q11 3-way join broadcasts the small dims") {
    assert(planString("q11_join3_agg").contains("BroadcastHashJoin"))
  }

  test("q04 aggregation is partial+final hash agg (map-side combine)") {
    val s = planString("q04_agg_group")
    assert("HashAggregate".r.findAllIn(s).size >= 2)
  }

  test("knn brute force plans TakeOrderedAndProject, codegen'd distance") {
    val df = index.Knn.bruteForce(
      Tables.load(spark, sfDir, "embeddings"), "embedding",
      Seq.fill(64)(0.1), 5, org.apache.spark.sql.graft.DistanceMetric.L2,
      Some("vec_id"))
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"))
    assert(s.contains("l2_dist"))
    // distance evaluates inside whole-stage codegen, not a fallback:
    // the '*(n)' prefix marks codegen'd stages in the plan string
    assert(s.contains("*(1) Project"))
  }

  test("window queries use a single shuffle per partitionBy") {
    val s = planString("q12_window_rank")
    assert(s.contains("Window"))
  }
}
