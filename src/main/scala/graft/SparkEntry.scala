package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 3-way broadcast join + exact-decimal agg (leaderboard-q2 shape). */
  def entry(spark: SparkSession): DataFrame =
    operators.RelationalOps.queries("q11_join3_agg")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalOps.queries ++ operators.VectorOps.queries ++
      operators.TextOps.queries ++ operators.DedupOps.queries ++
      operators.MultimodalOps.queries ++ operators.LeaderboardOps.queries ++
      operators.ScaleOps.queries ++ operators.StreamGateOps.queries ++
      operators.SpatialOps.queries ++ operators.StatOps.queries ++
      operators.WebOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.RelationalOps.oracles ++ operators.VectorOps.oracles ++
      operators.TextOps.oracles ++ operators.DedupOps.oracles ++
      operators.MultimodalOps.oracles ++ operators.LeaderboardOps.oracles ++
      operators.ScaleOps.oracles ++ operators.StreamGateOps.oracles ++
      operators.SpatialOps.oracles ++ operators.StatOps.oracles ++
      operators.WebOps.oracles
}
