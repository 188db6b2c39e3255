package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.MockTables

/** Replays the reference's own sqllogictest corpus DIRECTLY from
  * the `.slt` files under `/root/reference/test/sql` — every
  * directive (statement ok / statement error / query [rowsort]
  * [+ensure:...]) of every listed file, goldens compared exactly.
  *
  * Harness semantics mirror tools/sqllogictest/sqllogictest.cpp:
  *  - `query` compares rendered lines in order (NOSORT default,
  *    parser.cpp:112-118); `rowsort` sorts both sides first
  *    (sqllogictest.cpp:33-41).
  *  - values join with " "; NULLs render as `<type>_null` (the
  *    reference Value::ToString convention seen in the goldens).
  *  - `statement error` expects the statement to throw.
  *  - `+ensure:` tags run EXPLAIN and assert plan shape
  *    (sqllogictest.cpp:66-135). Spark mapping:
  *      topn[*N]             -> physical plan has TakeOrderedAndProject
  *      hash_join[*N]        -> >= N hash/sort-merge join operators
  *      hash_join_no_filter  -> joins present, no Filter ABOVE a join
  *                              (null-filter pushdown below is fine)
  *      nlj_init_check       -> a nested-loop/cartesian join operator
  *      seq_scan             -> scan pipeline only (no join/agg)
  *      index_scan/index_join-> WEAK: scalar indexes are by-design
  *                              Catalyst no-ops (SURVEY §2.5); assert
  *                              the lookup/join shape Catalyst chose
  *  - non-`+`-prefixed trailing tokens are ignored, as the reference
  *    parser does; `+timing`/`+explain` tags are measurement-only.
  *
  * Documented deviations (ANSI Spark vs reference quirk) are pinned in
  * `deviations` and asserted to OUR value, not skipped silently.
  */
@Slow
class SltReplaySpec extends SparkSpecBase {

  private val SltDir = "/root/reference/test/sql"

  private val files = Seq(
    "p3.01-seqscan.slt", "p3.02-insert.slt", "p3.03-update.slt",
    "p3.04-delete.slt", "p3.05-index-scan.slt", "p3.06-empty-table.slt",
    "p3.07-simple-agg.slt", "p3.08-group-agg-1.slt", "p3.09-group-agg-2.slt",
    "p3.10-simple-join.slt", "p3.11-multi-way-join.slt",
    "p3.12-repeat-execute.slt", "p3.13-nested-index-join.slt",
    "p3.14-hash-join.slt", "p3.15-multi-way-hash-join.slt",
    "p3.16-sort-limit.slt", "p3.17-topn.slt", "p3.18-integration-1.slt",
    "p3.19-integration-2.slt", "p0.03-string-scan.slt", "subquery.slt",
    "p0.01-lower-upper.slt", "p0.02-function-error.slt",
    "p3.00-primer.slt", "p3.20-window-function.slt",
    "baby_arithmetic.slt", "intro.slt", "update.slt", "order_by.slt",
    "hash_join.slt", "nested_index_join.slt", "index.slt",
    "vector.slt", "vector.01-insert-scan.slt", "vector.02-naive-knn.slt",
    "vector.03-index-selection.slt", "vector.04-ivfflat.slt",
    "vector.05-hnsw.slt",
    // the leaderboard workloads (timing tags are measurement-only
    // here; their perf is benchmarked as q60-q64)
    "p3.leaderboard-q1.slt", "p3.leaderboard-q1-window.slt",
    "p3.leaderboard-q2.slt", "p3.leaderboard-q3.slt")

  /** reference-quirk goldens we intentionally diverge from, keyed by
    * (file, exact statement): value = the line(s) WE must produce. */
  private val deviations: Map[(String, String), Seq[String]] = Map(
    // The reference's Count aggregate yields NULL over an empty input
    // (p3.07 golden `integer_null`); ANSI SQL (and Spark) define
    // count(col) over empty input as 0.
    ("p3.07-simple-agg.slt", "select count(v1) from t1;") -> Seq("0"))

  private case class Rec(kind: String, opts: Seq[String], sql: String,
      golden: Seq[String], line: Int)

  private def parse(file: String): Seq[Rec] = {
    val lines = Files.readAllLines(Paths.get(SltDir, file)).asScala
      .map(_.replaceAll("\\s+$", "")).toIndexedSeq
    val recs = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var i = 0
    def collectUntil(stop: String => Boolean): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (i < lines.length && !stop(lines(i))) { out += lines(i); i += 1 }
      out.toSeq
    }
    while (i < lines.length) {
      val l = lines(i).trim
      if (l.isEmpty || l.startsWith("#")) i += 1
      else if (l == "halt") return recs.toSeq
      else {
        val tokens = l.split("\\s+").toSeq
        val at = i
        tokens.head match {
          case "statement" =>
            i += 1
            val sql = collectUntil(_.trim.isEmpty).mkString("\n")
            recs += Rec("statement_" + tokens(1), Seq.empty, sql, Seq.empty, at)
          case "query" =>
            i += 1
            val sql = collectUntil(_.trim == "----").mkString("\n")
            i += 1 // skip ----
            val golden = collectUntil(_.trim.isEmpty)
            recs += Rec("query", tokens.drop(1), sql, golden, at)
          case _ => // sleep etc.: skip the block
            i += 1
            collectUntil(_.trim.isEmpty)
        }
      }
    }
    recs.toSeq
  }

  private def nullName(dt: DataType): String = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
      "integer_null"
    case _: StringType => "varchar_null"
    case _: DoubleType | _: FloatType | _: DecimalType => "decimal_null"
    case _: BooleanType => "boolean_null"
    case _: TimestampType => "timestamp_null"
    case _ => "null"
  }

  private def render(row: Row, schema: StructType): String =
    schema.zipWithIndex.map { case (f, ix) =>
      if (row.isNullAt(ix)) nullName(f.dataType) else row.get(ix).toString
    }.mkString(" ")

  /** mock/preloaded tables, registered only when the file mentions them */
  private val mockTables: Map[String, org.apache.spark.sql.SparkSession
      => org.apache.spark.sql.DataFrame] = Map(
    "__mock_table_1" -> MockTables.table1,
    "__mock_table_2" -> MockTables.table2,
    "__mock_table_3" -> MockTables.table3,
    "__mock_table_123" -> MockTables.table123,
    "__mock_graph" -> MockTables.graph,
    "__mock_agg_input_small" -> MockTables.aggInputSmall,
    "__mock_agg_input_big" -> MockTables.aggInputBig,
    "__mock_table_tas_2023_fall" -> MockTables.tasFall2023,
    "__mock_table_schedule_2023" -> MockTables.schedule2023,
    "test_simple_seq_1" -> MockTables.simpleSeq1,
    "test_simple_seq_2" -> MockTables.simpleSeq2,
    "__mock_t1" -> MockTables.t1,
    "__mock_t4_1m" -> (s => MockTables.t456(s, 0)),
    "__mock_t5_1m" -> (s => MockTables.t456(s, 30000)),
    "__mock_t6_1m" -> (s => MockTables.t456(s, 60000)),
    "__mock_t7" -> MockTables.t7,
    "__mock_t8" -> MockTables.t8,
    "__mock_t9" -> MockTables.t9)

  private def ensureCheck(e: Engine, tag: String, sql: String): Unit = {
    val plan = e.executeSql("explain (p) " + sql)
      .collect().map(_.getString(0)).mkString("\n")
    def joins = "HashJoin".r.findAllIn(plan).size +
      "SortMergeJoin".r.findAllIn(plan).size
    val starN = """\*(\d+)$""".r.findFirstMatchIn(tag).map(_.group(1).toInt)
    tag.stripSuffix(starN.map("*" + _).getOrElse("")) match {
      case "topn" =>
        assert(plan.contains("TakeOrderedAndProject"),
          s"ensure:$tag — no TopN operator:\n$plan")
      case "hash_join" =>
        assert(joins >= starN.getOrElse(1),
          s"ensure:$tag — found $joins joins:\n$plan")
      case "hash_join_no_filter" =>
        val firstJoin = plan.indexOf("Join")
        val firstFilter = plan.indexOf("Filter")
        assert(joins >= 1 && (firstFilter == -1 || firstFilter > firstJoin),
          s"ensure:$tag — residual Filter above join:\n$plan")
      case "nlj_init_check" =>
        // the reference pins NestedLoopJoin because its starter
        // optimizer can't do better; Catalyst upgrades many of these
        // (e.g. `on a.col1 + 5 = b.col1` hash-joins on the expression),
        // so assert a join happened, whatever physical form won
        assert(plan.contains("Join") || plan.contains("CartesianProduct"),
          s"ensure:$tag — no join operator:\n$plan")
      case "seq_scan" =>
        assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
          s"ensure:$tag — not a pure scan pipeline:\n$plan")
      case "index_scan" => // weak mapping: lookup served by the scan
        assert(!plan.contains("Join"),
          s"ensure:$tag — unexpected join in lookup:\n$plan")
      case "index_join" => // weak mapping: Catalyst's join selection
        assert(plan.contains("Join"),
          s"ensure:$tag — no join operator:\n$plan")
      case other => () // timing/explain and future tags: measurement-only
    }
  }

  private def replay(file: String): Unit = {
    val preexistingIndexes =
      graft.index.VectorIndexes.list().map(_.name).toSet
    // session-global leftovers a file may set (e.g. vector.03's
    // `set vector_index_method`) must not leak into later suites
    try replayAll(file)
    finally {
      spark.conf.unset("graft.vector_index_method")
      graft.index.VectorIndexes.list().map(_.name)
        .filterNot(preexistingIndexes)
        .foreach(graft.index.VectorIndexes.drop)
    }
  }

  private def replayAll(file: String): Unit = {
    val text = new String(
      Files.readAllBytes(Paths.get(SltDir, file)), "UTF-8")
    val e = new Engine(spark)
    mockTables.foreach { case (name, gen) =>
      if (text.contains(name)) e.registerTable(name, gen(spark))
    }
    val recs = parse(file)
    assert(recs.nonEmpty, s"$file parsed to zero directives")
    recs.foreach { r =>
      withClue(s"$file:${r.line + 1} [${r.kind}] ${r.sql.take(120)}\n") {
        r.kind match {
          case "statement_ok" =>
            e.executeSql(r.sql).collect()
          case "statement_error" =>
            intercept[Throwable](e.executeSql(r.sql).collect())
          case "query" =>
            r.opts.filter(_.startsWith("+ensure:")).foreach(t =>
              ensureCheck(e, t.stripPrefix("+ensure:"), r.sql))
            val df = e.executeSql(r.sql)
            val got = df.collect().map(render(_, df.schema)).toSeq
            val want = deviations.getOrElse((file, r.sql.trim), r.golden)
            if (r.opts.contains("rowsort"))
              assert(got.sorted == want.sorted,
                s"rowsort mismatch\ngot:\n${got.sorted.mkString("\n")}\n" +
                  s"want:\n${want.sorted.mkString("\n")}")
            else
              assert(got == want,
                s"ordered mismatch\ngot:\n${got.mkString("\n")}\n" +
                  s"want:\n${want.mkString("\n")}")
        }
      }
    }
  }

  files.foreach { f =>
    test(s"slt replay: $f") { replay(f) }
  }
}
