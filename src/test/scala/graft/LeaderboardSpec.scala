package graft

import graft.operators.LeaderboardOps

/** Exact golden outputs pinned by the reference SLT files
  * (p3.leaderboard-q1/q2/q3 inline expected blocks). */
class LeaderboardSpec extends SparkSpecBase {

  private def run(name: String) =
    LeaderboardOps.queries(name)(spark, sfDir)

  test("leaderboard q1 == reference golden rows") {
    val got = run("q60_leaderboard_q1").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val want = (90 to 99).map(x => (x, 10, x * 10000 + 10)).toSet
    assert(got == want)
  }

  test("leaderboard q2 == reference golden aggregate row") {
    val r = run("q61_leaderboard_q2").head()
    assert(r.getLong(0) == 400000L)
    assert((1 to 6).map(r.getInt) == Seq(149999, 1499990, 149999,
      1499990, 149999, 1499990))
  }

  test("leaderboard q3 == reference golden 20 rows") {
    val got = run("q62_leaderboard_q3").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val want = (0 until 20).map(v =>
      (v, 999980 + v, 3 * (999980 + v))).toSet
    assert(got == want)
  }

  test("p3.08 group-agg goldens over __mock_agg_input_small") {
    import org.apache.spark.sql.functions._
    val t = graft.operators.MockTables.aggInputSmall(spark)
    // group by constant key: one group over all 1000 rows
    val g5 = t.groupBy("v5").agg(min("v1"), sum("v2"), count(lit(1))).head()
    assert(g5.toSeq == Seq(233, 0, 499500L, 1000L))
    // group by v4: min(v1)+sum(v2)+max(v3) == 10000*v4 + 5049, 100 rows
    val g4 = t.groupBy("v4")
      .agg((min("v1") + sum("v2") + max("v3")).as("m"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(g4 == (0 until 10).map(k => (k, 10000L * k + 5049L, 100L)).toSet)
    // group agg over empty input: no groups, no output (p3.08 golden)
    assert(t.filter(lit(false)).groupBy("v5").agg(count(lit(1))).isEmpty)
  }

  test("leaderboard q1-window == reference golden 10 rows") {
    // p3.leaderboard-q1-window.slt inline expected block (multiset:
    // the slt is `nosort` but compared rows carry identical values)
    val got = run("q64_leaderboard_q1_window").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
      .sorted.reverse
    val want = Seq(
      (999, 5000000), (999, 5000000),
      (999, 5000002), (999, 5000002), (999, 5000002), (999, 5000002),
      (998, 5005001), (998, 5005001),
      (998, 5005002), (998, 5005002)).sorted.reverse
    assert(got == want)
  }

  test("mock t9 10M-row agg invariants") {
    val rows = run("q63_mock_t9_agg").collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getLong(3) == 10000L)) // 10000 rows per x bucket
  }
}
