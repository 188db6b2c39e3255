package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** The one plan audit that covers ALL of `SparkEntry.queries`: no
  * query may plan an UNPARTITIONED window — `over (order by …)` with
  * no `partition by` funnels every row through a single task, the one
  * physical shape that cannot scale out no matter the cluster size
  * (the repo's global-order sweeps ride DistributedPrefix instead).
  * PlanShapeSpec pins the designed shape of individual queries; this
  * sweep guarantees the anti-shape never creeps into ANY of them. */
class WindowScanSpec extends SparkSpecBase {

  /** Queries that rank a BOUNDED frame in one partition ON PURPOSE —
    * each writes `Window.partitionBy(lit(1))` over an input that is
    * structurally small (a TakeOrdered top-k list or a value-DOMAIN
    * aggregate), and Catalyst's EliminateWindowPartitions folds the
    * constant key away, so the physical node reads as unpartitioned.
    * The list is EXACT: a query that stops planning one must leave,
    * and any new unpartitioned window must either be fixed or argued
    * into this map with its bound. */
  private val boundedSinglePartition: Map[String, String] = Map(
    "q100_hybrid_search" ->
      "ranks two TakeOrdered top-100 candidate lists (RRF fusion)",
    "q224_feistel_shuffle" ->
      "ranks the TakeOrdered top-20 of the permuted order",
    "q235_cdc_chunks" ->
      "ranks the TakeOrdered top-10 chunk fingerprints",
    "q236_zonemap_forecast" ->
      ("cumulative over the value-DOMAIN table (groupBy v), row count " +
        "bounded by distinct doc lengths, never the corpus"),
    "q294_ewma_forecast" ->
      ("cumulative over the CALENDAR-bounded daily table — trailing " +
        "50 days by construction, never the event volume"))

  private def unpartitioned(p: SparkPlan): Seq[WindowExec] = {
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case _ => Seq.empty
    }
    val kids = p.children ++ p.subqueries ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    })
    self ++ kids.flatMap(unpartitioned)
  }

  test("no query in SparkEntry.queries plans an unpartitioned window " +
      "outside the exact bounded allowlist") {
    val offenders = Seq.newBuilder[String]
    val unplanned = Seq.newBuilder[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        if (unpartitioned(plan).nonEmpty) offenders += name
      } catch { case e: Throwable =>
        unplanned += s"$name: ${e.getClass.getSimpleName}"
      }
    }
    val got = offenders.result().toSet
    val fresh = got -- boundedSinglePartition.keySet
    val stale = boundedSinglePartition.keySet -- got
    assert(fresh.isEmpty,
      s"NEW unpartitioned windows in: ${fresh.toSeq.sorted.mkString(", ")}")
    assert(stale.isEmpty,
      s"stale allowlist entries (no longer plan one): ${
        stale.toSeq.sorted.mkString(", ")}")
    // a query that fails to PLAN at sf0.001 silently escapes the
    // audit — the sweep must be total, so planning failures fail too
    assert(unplanned.result().isEmpty,
      s"audit could not plan: ${unplanned.result().mkString("; ")}")
  }
}
