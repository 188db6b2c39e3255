package graft

import scala.collection.concurrent.TrieMap

/** Side-channel for the QUALITY metric of recall-gated queries
  * (q35/q36/q37/q120/q133/q137): the gate bodies compute a numeric
  * recall and then collapse it to the boolean `recall_ok` the DuckDB
  * oracle can check. The number itself is what BASELINE.md names as
  * the quality metric, so each gate also records it here and Bench
  * snapshots the map into BENCH_DETAIL.json next to the wall times —
  * a recall regression becomes visible across rounds without the
  * oracle. Values are from the exact executions Bench timed (no
  * re-computation); last write per query wins, which is the most
  * recent run of that gate in this JVM. */
object GateMetrics {
  private val recalls = TrieMap.empty[String, Double]

  def putRecall(query: String, recall: Double): Unit = {
    recalls.put(query, recall): Unit
  }

  /** (query -> recall), sorted for stable JSON. */
  def snapshot: Seq[(String, Double)] = recalls.toSeq.sortBy(_._1)
}
