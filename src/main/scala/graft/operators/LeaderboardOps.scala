package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's leaderboard workloads — its only perf-pinned
  * queries (BASELINE.md) — over faithful ports of the mock-table
  * generators (`src/execution/mock_scan_executor.cpp:363-476`),
  * generated distributively with spark.range (no driver loops, no
  * data files; a 10M-row table is a range + two projections).
  *
  * Golden outputs are pinned inline in the reference SLT files and
  * asserted exactly in LeaderboardSpec; the driver gate records these
  * as rows-only (the DuckDB oracle only sees the sf parquet tables).
  */
object MockTables {
  /** __mock_t1: x=i/10000, y=i%10000, z=i; 1M rows (:363-371). */
  def t1(s: SparkSession): DataFrame =
    s.range(1000000L).selectExpr("CAST(id DIV 10000 AS INT) AS x",
      "CAST(id % 10000 AS INT) AS y", "CAST(id AS INT) AS z")

  /** __mock_t4/5/6_1m: cursor=(i+off)%500000 -> (cursor, cursor*10);
    * 1M rows each (:373-401). */
  def t456(s: SparkSession, offset: Long): DataFrame =
    s.range(1000000L).selectExpr(
      s"CAST((id + $offset) % 500000 AS INT) AS x",
      s"CAST(((id + $offset) % 500000) * 10 AS INT) AS y")

  /** __mock_t7: (i%20, i, i); 1M rows (:403-411). */
  def t7(s: SparkSession): DataFrame =
    s.range(1000000L).selectExpr("CAST(id % 20 AS INT) AS v",
      "CAST(id AS INT) AS v1", "CAST(id AS INT) AS v2")

  /** __mock_t8: v4=i; 10 rows (:413-419). */
  def t8(s: SparkSession): DataFrame =
    s.range(10L).selectExpr("CAST(id AS INT) AS v4")

  /** __mock_t9: (i/10000, 10^7 - (i/2 + ((i/10000)%2)*((i/2)%2)));
    * 10M rows (:421-429). */
  def t9(s: SparkSession): DataFrame =
    s.range(10000000L).selectExpr("CAST(id DIV 10000 AS INT) AS x",
      "CAST(10000000 - (id DIV 2 + ((id DIV 10000) % 2) * ((id DIV 2) % 2)) AS INT) AS y")

  /** __mock_agg_input_small: 1000 rows of modular columns + a repeated
    * emoji varchar (:309-322). */
  def aggInputSmall(s: SparkSession): DataFrame =
    s.range(1000L).selectExpr(
      "CAST((id + 2) % 10 AS INT) AS v1", "CAST(id AS INT) AS v2",
      "CAST((id + 50) % 100 AS INT) AS v3", "CAST(id DIV 100 AS INT) AS v4",
      "CAST(233 AS INT) AS v5", "repeat('💩', CAST(id % 8 AS INT) + 1) AS v6")

  /** __mock_agg_input_big: 10000 rows, v4=i/1000, v6 up to 16 repeats
    * (:325-338). */
  def aggInputBig(s: SparkSession): DataFrame =
    s.range(10000L).selectExpr(
      "CAST((id + 2) % 10 AS INT) AS v1", "CAST(id AS INT) AS v2",
      "CAST((id + 50) % 100 AS INT) AS v3", "CAST(id DIV 1000 AS INT) AS v4",
      "CAST(233 AS INT) AS v5", "repeat('💩', CAST(id % 16 AS INT) + 1) AS v6")

  /** __mock_table_1: (i, i*100), 100 rows (:228-236, size :137-139). */
  def table1(s: SparkSession): DataFrame =
    s.range(100L).selectExpr("CAST(id AS INT) AS colA",
      "CAST(id * 100 AS INT) AS colB")

  /** __mock_table_2: ("{i}-💩", "😇" x (i%8)), 100 rows (:239-249). */
  def table2(s: SparkSession): DataFrame =
    s.range(100L).selectExpr(
      "concat(CAST(id AS STRING), '-💩') AS colC",
      "repeat('😇', CAST(id % 8 AS INT)) AS colD")

  /** __mock_table_3: colE = i when even else NULL, 100 rows (:251-264). */
  def table3(s: SparkSession): DataFrame =
    s.range(100L).selectExpr(
      "CASE WHEN id % 2 = 0 THEN CAST(id AS INT) ELSE CAST(NULL AS INT) END AS colE",
      "concat(CAST(id AS STRING), '-💩') AS colF")

  /** __mock_table_123: number = i+1, 3 rows (:344-350). */
  def table123(s: SparkSession): DataFrame =
    s.range(3L).selectExpr("CAST(id + 1 AS INT) AS number")

  /** __mock_graph: 10x10 node pairs, distance NULL on the diagonal,
    * labels zero-padded (:352-370). */
  def graph(s: SparkSession): DataFrame =
    s.range(100L).selectExpr(
      "CAST(id % 10 AS INT) AS src", "CAST(id DIV 10 AS INT) AS dst",
      "lpad(CAST(id % 10 AS STRING), 3, '0') AS src_label",
      "lpad(CAST(id DIV 10 AS STRING), 3, '0') AS dst_label",
      "CASE WHEN id % 10 = id DIV 10 THEN CAST(NULL AS INT) ELSE 1 END AS distance")

  // Pinned fixture rows from the reference's mock catalog
  // (mock_scan_executor.cpp:32-45) — test data, reproduced verbatim so
  // the SLT goldens that join over them replay exactly.
  private val TasFall2023 = Seq(
    ("skyzh", "Randomly"), ("yliang412", "Tuesday"),
    ("fernandolis10", "Wednesday"), ("wiam8", "Tuesday"),
    ("anurag-23", "Thursday"), ("Mayank-Baranwal", "Tuesday"),
    ("abigalekim", "Friday"), ("ChaosZhai", "Yesterday"),
    ("aoleizhou", "Friday"), ("averyqi115", "Friday"), ("kswim8", "Never"))

  private val Days = Seq("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  /** __mock_table_tas_2023_fall (github_id, office_hour). */
  def tasFall2023(s: SparkSession): DataFrame = {
    import s.implicits._
    TasFall2023.toDF("github_id", "office_hour")
  }

  /** __mock_table_schedule_2023: has_lecture on Monday+Wednesday
    * (:303-310). */
  def schedule2023(s: SparkSession): DataFrame = {
    import s.implicits._
    Days.zipWithIndex
      .map { case (d, i) => (d, if (i == 0 || i == 2) 1 else 0) }
      .toDF("day_of_week", "has_lecture")
  }

  /** test_simple_seq_1/2 (table_generator.cpp:97-101): serial columns. */
  def simpleSeq1(s: SparkSession): DataFrame =
    s.range(10L).selectExpr("CAST(id AS INT) AS col1")

  def simpleSeq2(s: SparkSession): DataFrame =
    s.range(10L).selectExpr("CAST(id AS INT) AS col1",
      "CAST(id + 10 AS INT) AS col2")
}

object LeaderboardOps {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // p3.leaderboard-q1: point-range filter over 1M rows. The
    // reference needs a (x,y) B+tree index; Catalyst's codegen'd
    // filter over the generated range IS the scan — 10 rows out.
    "q60_leaderboard_q1" -> ((s, _) =>
      MockTables.t1(s).filter(col("x") >= 90 && col("y") === 10)),

    // p3.leaderboard-q2: selective 3-way equi-join over 3 x 1M rows
    // (reference golden: 400000 149999 1499990 x3). Catalyst picks
    // the join order + shuffled hash/SMJ; filters push below joins.
    "q61_leaderboard_q2" -> ((s, _) => {
      val t4 = MockTables.t456(s, 0).as("t4")
      val t5 = MockTables.t456(s, 30000).as("t5")
      val t6 = MockTables.t456(s, 60000).as("t6")
      t4.join(t5, col("t4.x") === col("t5.x"))
        .join(t6, col("t6.y") === col("t5.y"))
        .filter(col("t4.y") >= 1000000 && col("t4.y") < 1500000 &&
          col("t6.x") < 150000 && col("t6.x") >= 100000)
        .agg(count(lit(1)).as("cnt"),
          max("t4.x").as("m4x"), max("t4.y").as("m4y"),
          max("t5.x").as("m5x"), max("t5.y").as("m5y"),
          max("t6.x").as("m6x"), max("t6.y").as("m6y"))
    }),

    // p3.leaderboard-q3: wide aggregate over 1M rows left-joined with
    // an empty derived table (reference prunes the dead join + dedups
    // the repeated aggregates; Catalyst's CollapseProject +
    // PropagateEmptyRelation do the same).
    "q62_leaderboard_q3" -> ((s, _) => {
      val t7 = MockTables.t7(s)
      val emptyT8 = MockTables.t8(s).filter(lit(1) === lit(2))
      t7.join(emptyT8, col("v") < col("v4"), "left")
        .groupBy("v")
        .agg(max("v1").as("d1"),
          (max("v1") + max("v1") + max("v2")).as("d2"),
          min("v1").as("x1"), max("v2").as("x2"), min("v2").as("x3"),
          (max("v1") + min("v1")).as("x4"),
          (max("v2") + min("v2")).as("x5"))
        .select("v", "d1", "d2")
    }),

    // __mock_t9 scan + agg (the 10M-row member of the q3 fixture
    // family): proves the generator scales without materialization.
    "q63_mock_t9_agg" -> ((s, _) =>
      MockTables.t9(s).groupBy("x")
        .agg(min("y").as("min_y"), max("y").as("max_y"),
          count(lit(1)).as("n"))
        .orderBy(col("x")).limit(20)),

    // p3.leaderboard-q1-window: rank-per-partition top-3 over the
    // 10M-row __mock_t9, then a global TopN. The window's (x) hash
    // partitioning spreads 1000 groups over the cluster; the outer
    // ORDER BY y LIMIT 10 is TakeOrderedAndProject — no global sort.
    "q64_leaderboard_q1_window" -> ((s, _) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("x").orderBy(col("y").asc)
      MockTables.t9(s)
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select("x", "y")
        .orderBy(col("y").asc).limit(10)
    })
  )

  /** The mock generators are pure arithmetic over the row index
    * (mock_scan_executor.cpp:363-429), so DuckDB `range()` reproduces
    * them exactly — these queries get full value oracles even though
    * they touch no parquet table. */
  private def t456Sql(off: Long): String =
    s"SELECT ((range + $off) % 500000)::INT AS x, " +
      s"(((range + $off) % 500000) * 10)::INT AS y FROM range(1000000)"

  private val t9Sql: String =
    """SELECT (range // 10000)::INT AS x,
      |  (10000000 - (range // 2 + ((range // 10000) % 2) * ((range // 2) % 2)))::INT AS y
      |FROM range(10000000)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q60_leaderboard_q1" ->
      """WITH t1 AS (SELECT (range // 10000)::INT AS x, (range % 10000)::INT AS y,
        |  range::INT AS z FROM range(1000000))
        |SELECT x, y, z FROM t1 WHERE x >= 90 AND y = 10""".stripMargin,
    "q61_leaderboard_q2" ->
      s"""WITH t4 AS (${t456Sql(0)}),
        |     t5 AS (${t456Sql(30000)}),
        |     t6 AS (${t456Sql(60000)})
        |SELECT count(*) AS cnt, max(t4.x) AS m4x, max(t4.y) AS m4y,
        |  max(t5.x) AS m5x, max(t5.y) AS m5y,
        |  max(t6.x) AS m6x, max(t6.y) AS m6y
        |FROM t4 JOIN t5 ON t4.x = t5.x JOIN t6 ON t6.y = t5.y
        |WHERE t4.y >= 1000000 AND t4.y < 1500000
        |  AND t6.x < 150000 AND t6.x >= 100000""".stripMargin,
    "q62_leaderboard_q3" ->
      """WITH t7 AS (SELECT (range % 20)::INT AS v, range::INT AS v1,
        |  range::INT AS v2 FROM range(1000000)),
        |     t8 AS (SELECT range::INT AS v4 FROM range(10) WHERE 1 = 2)
        |SELECT v, max(v1) AS d1, max(v1) + max(v1) + max(v2) AS d2
        |FROM t7 LEFT JOIN t8 ON v < v4
        |GROUP BY v""".stripMargin,
    "q63_mock_t9_agg" ->
      s"""WITH t9 AS ($t9Sql)
        |SELECT x, min(y) AS min_y, max(y) AS max_y, count(*) AS n
        |FROM t9 GROUP BY x ORDER BY x LIMIT 20""".stripMargin,
    "q64_leaderboard_q1_window" ->
      s"""WITH t9 AS ($t9Sql),
        |r AS (SELECT x, y, rank() OVER (PARTITION BY x ORDER BY y) AS rnk
        |      FROM t9)
        |SELECT x, y FROM r WHERE rnk <= 3 ORDER BY y LIMIT 10""".stripMargin
  )
}
