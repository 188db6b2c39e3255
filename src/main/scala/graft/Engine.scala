package graft

import scala.collection.concurrent.TrieMap
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DistanceMetric
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions
import graft.index.VectorIndexes

/** The reference's user-facing surface (`BustubInstance::ExecuteSql`,
  * reference src/common/bustub_instance.cpp:234-325) on Spark: a user
  * of bustub-vectordb can run their SQL verbatim.
  *
  * Supported statements (everything the reference's test corpus uses):
  *  - `CREATE TABLE t(v VECTOR(3), x integer, ...)` — binder semantics
  *    from src/binder/bind_create.cpp:76-103; VECTOR(n) requires an
  *    explicit dim (:93), enforced again on every insert (:90-97).
  *  - `INSERT INTO t VALUES (ARRAY [..], ..), ..` / `INSERT INTO t
  *    SELECT ..` — returns the reference's single-row insert count
  *    (insert_executor.cpp:28-52) AND maintains vector indexes, the
  *    declared behavior the reference itself skips (the
  *    `vector.04/05.slt` insert-after-index contract; comment at
  *    insert_executor.cpp:45).
  *  - `CREATE INDEX name ON t USING ivfflat|hnsw (col opclass) WITH
  *    (k = v, ...)` — bustub_ddl.cpp:88-152; opclass→metric per
  *    catalog.h:305-313. Scalar index methods (hash, bplustree,
  *    stl_*) are accepted and recorded as no-ops: Catalyst's
  *    pruning/pushdown replaces them.
  *  - `set x = y` / `show x` — bustub_ddl.cpp:196-215; the meaningful
  *    variable is vector_index_method (optimizer.cpp:26).
  *  - `EXPLAIN [(opts)] stmt` — returns Spark's plan string.
  *  - `DELETE FROM t [WHERE ..]` / `UPDATE t SET .. [WHERE ..]` — the
  *    reference declares these (plan_insert.cpp:42-79, executors are
  *    stubs); here they are anti-join / recompute-overwrite rewrites.
  *  - `SELECT ..` with `ARRAY [..]` literals and the distance
  *    operators `<->` (l2), `<=>` (cosine), `<#>` (inner product)
  *    (expression_factory.cpp:104-112) — rewritten to function calls
  *    and served by spark.sql with our Catalyst expressions; KNN
  *    queries go through VectorIndexScanRule when an index matches.
  *
  * Tables live as named DataFrames (registered temp views), the Spark
  * analogue of the reference catalog's TableHeap entries. At scale a
  * table would be parquet-backed; `registerTable` accepts any
  * DataFrame, so both work.
  */
final class Engine(val spark: SparkSession) {

  VectorFunctions.register(spark)
  VectorIndexes.enableRewrite(spark)
  // reference binder strictness: upper/lower reject non-string args
  // (p0.02-function-error.slt) — Spark would implicitly cast
  Seq("upper" -> true, "lower" -> false).foreach { case (name, up) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        require(exprs.length == 1, s"$name expects exactly 1 argument")
        org.apache.spark.sql.graft.StrictStringCase(exprs.head, up)
      },
      "built-in")
  }

  private val tables = TrieMap.empty[String, DataFrame]
  /** declared VECTOR dims per (table, column) — binder enforcement */
  private val vectorDims = TrieMap.empty[(String, String), Int]
  /** original CREATE INDEX DDL per index name — replayed to rebuild
    * after DELETE/UPDATE (the reference's VectorIndex declares deletes
    * unsupported, vector_index.h:23-25; a rebuild is the correct
    * course-scale answer, and it also renumbers the positional row
    * ids that a delete would otherwise shift under the index) */
  private val indexDdl = TrieMap.empty[String, (String, String)] // name -> (table, sql)
  /** CREATE INDEX on an empty table defers the build to the first
    * insert (the reference BuildIndex silently early-returns into a
    * broken index there — ivfflat_index.cpp:78-80; deferral is the
    * finished-engine behavior). */
  private val pendingIndexes = TrieMap.empty[String, (String, String)]

  /** Statement(s) in, one DataFrame out (DDL returns an empty or
    * count/message frame, like the reference's ResultWriter). Leading
    * `--` comment lines are stripped and `;`-separated compound input
    * executes each statement in order, returning the last result —
    * both appear in the reference's own SLT corpus (e.g.
    * p3.15-multi-way-hash-join.slt's `create ...; insert ...;`). */
  def executeSql(sqlRaw: String): DataFrame = {
    val stmts = splitStatements(sqlRaw).map(_.trim).filter(_.nonEmpty)
    require(stmts.nonEmpty, s"empty statement: $sqlRaw")
    stmts.map(s => plan(s, execute = true)).last
  }

  /** split on `;` outside single-quoted strings, dropping `--` line
    * comments along the way (a comment may contain quotes — p3.19) */
  private def splitStatements(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var inStr = false; var i = 0; val cur = new StringBuilder
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; cur += c; i += 1 }
      else if (c == '\'') { inStr = true; cur += c; i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1 // skip comment
      }
      else if (c == ';') { out += cur.toString; cur.clear(); i += 1 }
      else { cur += c; i += 1 }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** `execute=false` (the EXPLAIN path) must be side-effect free: DML
    * returns its would-be plan, DDL a description — the reference's
    * EXPLAIN never runs the statement. */
  private def plan(sql: String, execute: Boolean): DataFrame = {
    val lower = sql.toLowerCase
    if (sql.startsWith("\\dt")) { // meta commands (bustub_instance:257-281)
      import spark.implicits._
      tables.keys.toSeq.sorted.toDF("table")
    }
    else if (sql.startsWith("\\di")) {
      import spark.implicits._
      VectorIndexes.list().map(m => (m.name, m.table, m.column, m.method))
        .sortBy(_._1).toDF("index", "table", "column", "method")
    }
    else if (sql.startsWith("\\d ")) { // describe one table
      import spark.implicits._
      val t = sql.stripPrefix("\\d").trim
      table(t).schema.filterNot(_.name == Engine.RowId)
        .map(f => (f.name, f.dataType.simpleString)).toSeq
        .toDF("column", "type")
    }
    else if (sql.startsWith("\\help")) { // bustub_instance.cpp:257-281
      import spark.implicits._
      Seq("\\dt: show all tables", "\\di: show all indices",
        "\\d <table>: describe one table", "\\help: show this message")
        .toDF("help")
    }
    else if (lower.startsWith("create table"))
      if (execute) createTable(sql) else message(s"ddl: $sql")
    else if (lower.startsWith("create index"))
      if (execute) createIndex(sql) else message(s"ddl: $sql")
    else if (lower.startsWith("insert into")) insert(sql, execute)
    else if (lower.startsWith("set ")) setVar(sql)
    else if (lower.startsWith("show ")) showVar(sql)
    else if (lower.startsWith("explain")) explain(sql)
    else if (lower.startsWith("delete from")) delete(sql, execute)
    else if (lower.startsWith("update ")) update(sql, execute)
    else spark.sql(rewriteExprs(sql))
  }

  def registerTable(name: String, df: DataFrame): Unit = {
    // Cache: queries then resolve to a stable InMemoryRelation leaf the
    // KNN rule can recognize (LocalRelation unions get constant-folded
    // by the optimizer, destroying plan identity).
    //
    // Invariant: every stored table carries Engine.RowId, assigned ONCE
    // when rows enter the engine and never re-derived — deletes keep
    // surviving ids, updates carry them through, inserts extend past
    // the max. (A positional id recomputed per maintenance pass would
    // silently renumber rows if partition order ever changed, and its
    // global row_number window funnels the table through one task.)
    //
    // Ordering matters for that invariant: the new cache MUST
    // materialize while the previous incarnation's cache is still
    // live. The new plan's lineage runs THROUGH the old table (insert
    // = old table unionAll new rows); unpersisting first would make
    // materialization recompute the old rows from raw lineage —
    // re-running every prior insert's monotonically_increasing_id and
    // potentially renumbering rows a nondeterministic INSERT...SELECT
    // source produced, invalidating index entries built from those ids.
    // And materialize-then-SWAP keeps failure atomic: if the count
    // throws (ANSI cast error in an UPDATE expression, task failure),
    // the old entry is still registered and its cache intact — the
    // statement fails, the table doesn't disappear.
    val cached = withRowId(df).cache()
    try cached.count() // materialize while the old cache is still live
    catch { case e: Throwable => cached.unpersist(); throw e }
    tables.put(name, cached).foreach(_.unpersist())
    // the user-facing view hides the internal rid (SELECT * parity)
    cached.drop(Engine.RowId).createOrReplaceTempView(name)
    refreshIndexLeaves(name)
  }

  /** Point existing index metadata at the table's current cached plan
    * (tables are immutable DataFrames; insert/delete/update swap them).
    * Resolves THROUGH the temp view with a full optimization pass so
    * the recorded leaf is exactly what the optimizer rule will see in
    * user queries (cache substitution included). */
  private def refreshIndexLeaves(tbl: String): Unit = {
    val leaves = spark.table(tbl).queryExecution.optimizedPlan.collectLeaves()
    val leaf = if (leaves.length == 1) Some(leaves.head.canonicalized) else None
    VectorIndexes.list().filter(_.table == tbl)
      .foreach(m => VectorIndexes.register(m.copy(leaf = leaf)))
  }

  def table(name: String): DataFrame =
    tables.getOrElse(name, sys.error(s"unknown table $name"))

  /** Persist / reopen the vector-index registry (catalog metadata +
    * each index's saved layout) so an engine restart serves KNN from
    * its existing indexes instead of rebuilding. Load AFTER
    * re-registering tables: the loaded entries carry no plan leaf, so
    * each affected table's leaf is re-derived here against the current
    * cached plan (the optimizer rule matches on it). */
  def saveIndexRegistry(root: String): Unit =
    VectorIndexes.saveRegistry(spark, root)
  def loadIndexRegistry(root: String): Unit = {
    VectorIndexes.loadRegistry(spark, root)
    VectorIndexes.list().map(_.table).distinct
      .filter(tables.contains).foreach(refreshIndexLeaves)
  }

  // ---- statement handlers -------------------------------------------------

  private val createTableRe: Regex =
    """(?is)create\s+table\s+(\w+)\s*\((.*)\)""".r

  private def createTable(sql: String): DataFrame = sql match {
    case createTableRe(name, colsStr) =>
      val fields = splitTopLevel(colsStr).map { colDef =>
        val parts = colDef.trim.split("\\s+", 2)
        val (cname, ctype) = (parts(0), parts(1).trim.toLowerCase)
        val vecRe = """vector\s*\(\s*(\d+)\s*\)""".r
        ctype match {
          case vecRe(dim) =>
            vectorDims.put((name, cname), dim.toInt)
            StructField(cname, ArrayType(DoubleType))
          case t if t.startsWith("bool")     => StructField(cname, BooleanType)
          case t if t.startsWith("tinyint")  => StructField(cname, ByteType)
          case t if t.startsWith("smallint") => StructField(cname, ShortType)
          case t if t.startsWith("int")      => StructField(cname, IntegerType)
          case t if t.startsWith("bigint")   => StructField(cname, LongType)
          // reference DECIMAL is a C double (decimal_type.cpp:25-33)
          case t if t.startsWith("decimal") || t.startsWith("double") =>
            StructField(cname, DoubleType)
          case t if t.startsWith("varchar") || t.startsWith("text") =>
            StructField(cname, StringType)
          case t if t.startsWith("timestamp") =>
            StructField(cname, TimestampType)
          case other => sys.error(s"unsupported column type $other")
        }
      }
      // re-creating a table name makes any index recorded for the old
      // incarnation meaningless — drop them (incl. another Engine's on
      // the shared session: the registry is name-global) so a stale
      // index can never serve queries against the new table
      VectorIndexes.list().filter(_.table == name)
        .foreach(m => VectorIndexes.drop(m.name))
      indexDdl.toSeq.filter(_._2._1 == name)
        .foreach { case (n, _) => indexDdl.remove(n) }
      pendingIndexes.toSeq.filter(_._2._1 == name)
        .foreach { case (n, _) => pendingIndexes.remove(n) }
      registerTable(name,
        spark.createDataFrame(new java.util.ArrayList[Row](),
          StructType(fields)))
      message(s"Table created: $name")
    case _ => sys.error(s"cannot parse CREATE TABLE: $sql")
  }

  private val createIndexRe: Regex =
    ("""(?is)create\s+index\s+(\w+)\s+on\s+(\w+)\s*(?:using\s+(\w+)\s*)?""" +
      """\(([^)]*)\)(?:\s+with\s*\((.*)\))?""").r

  private def createIndex(sql: String): DataFrame = sql match {
    case createIndexRe(name, tbl, methodOrNull, colsRaw, optsOrNull) =>
      // bare `create index i on t(col)` = the reference's default
      // B+tree — a scalar method, recorded as a metadata no-op below.
      // Multi-column lists (`on t1(x, y)`, leaderboard-q1) are scalar
      // by construction; a vector index takes one `col [opclass]`.
      val method = Option(methodOrNull).getOrElse("bplustree")
      val colSpecs = colsRaw.trim.split(",").map(_.trim.split("\\s+"))
      require(colSpecs.nonEmpty && colSpecs.head.head.nonEmpty,
        s"empty column list in CREATE INDEX: $sql")
      // a vector index takes exactly one `col [opclass]`; silently
      // ignoring extra columns would build the wrong index
      require(colSpecs.length == 1 ||
        !Seq("ivfflat", "hnsw").contains(method.toLowerCase),
        s"vector index $name takes a single column, got: $colsRaw")
      val colName = colSpecs.head.head
      val opclassOrNull =
        if (colSpecs.length == 1 && colSpecs.head.length > 1)
          colSpecs.head(1)
        else null
      val opts: Map[String, Int] = Option(optsOrNull).map {
        _.split(",").map { kv =>
          val Array(k, v) = kv.split("=").map(_.trim)
          k.toLowerCase -> v.toInt
        }.toMap
      }.getOrElse(Map.empty)
      val metric = Option(opclassOrNull).map(_.toLowerCase) match {
        case Some("vector_ip_ops")     => DistanceMetric.InnerProduct
        case Some("vector_cosine_ops") => DistanceMetric.Cosine
        case _                         => DistanceMetric.L2
      }
      val df = table(tbl)
      val isVector =
        Seq("ivfflat", "hnsw").contains(method.toLowerCase)
      if (isVector && df.isEmpty) {
        pendingIndexes.put(name, (tbl, sql))
        indexDdl.put(name, (tbl, sql))
        return message(s"Index created (build deferred until data): $name")
      }
      method.toLowerCase match {
        case "ivfflat" =>
          val (lists, probe) = (opts.get("lists"), opts.get("probe_lists"))
          // both options required (ivfflat_index.cpp:16-29)
          require(lists.isDefined && probe.isDefined,
            "ivfflat requires lists and probe_lists")
          VectorIndexes.createIvfFlat(name, tbl, df,
            Engine.RowId, colName, lists.get, probe.get, metric)
        case "hnsw" =>
          // all three required (hnsw_index.cpp:33-47)
          require(Seq("m", "ef_construction", "ef_search")
            .forall(opts.contains),
            "hnsw requires m, ef_construction, ef_search")
          VectorIndexes.createHnsw(name, tbl, df,
            Engine.RowId, colName, opts("m"), opts("ef_construction"),
            opts("ef_search"), metric)
        case _ =>
          // scalar index methods: metadata-only no-op (SURVEY §2.5)
          ()
      }
      refreshIndexLeaves(tbl) // match against the cached-table leaf
      indexDdl.put(name, (tbl, sql))
      message(s"Index created: $name")
    case _ => sys.error(s"cannot parse CREATE INDEX: $sql")
  }

  /** DELETE/UPDATE invalidate vector indexes (reference: deletes are
    * unsupported by VectorIndex) — drop and rebuild from the recorded
    * DDL so subsequent KNN stays correct. */
  private def rebuildIndexes(tbl: String): Unit =
    indexDdl.toSeq.filter(_._2._1 == tbl).foreach { case (name, (_, ddl)) =>
      VectorIndexes.drop(name)
      createIndex(ddl)
    }

  private def insert(sql: String, execute: Boolean = true): DataFrame = {
    val insRe = """(?is)insert\s+into\s+(\w+)\s+(.*)""".r
    val insRe(tbl, rest) = sql: @unchecked
    val target = table(tbl)
    val src =
      if (rest.trim.toLowerCase.startsWith("values"))
        spark.sql(s"SELECT * FROM (${rewriteExprs(rest.trim)})")
      else spark.sql(rewriteExprs(rest.trim)) // INSERT INTO t SELECT ...
    // schema must match exactly (plan_insert.cpp:31-37) modulo names;
    // vector dims re-checked like the binder (bind_create.cpp:90-97).
    // The internal row id is engine-assigned, never user-supplied.
    val userSchema = StructType(
      target.schema.filterNot(_.name == Engine.RowId))
    require(src.schema.length == userSchema.length,
      s"column count mismatch inserting into $tbl")
    val aligned = src.toDF(userSchema.map(_.name): _*)
      .select(userSchema.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    if (!execute) return aligned // EXPLAIN: the would-be rows, no effect
    // the binder REJECTS type mismatches; a cast that nulls out a
    // non-null source value is a mismatch, not data (also keeps NULLed
    // vectors from slipping past the dim check below)
    val badCast = src.toDF(userSchema.map(_.name): _*).select(
      userSchema.zipWithIndex.map { case (f, i) =>
        (col(f.name).isNotNull &&
          col(f.name).cast(f.dataType).isNull).as(s"b$i") }.toIndexedSeq: _*)
      .filter(Seq.tabulate(userSchema.length)(i => col(s"b$i"))
        .reduce(_ || _))
    require(badCast.isEmpty,
      s"type mismatch inserting into $tbl (value does not cast)")
    vectorDims.foreach { case ((t, c), dim) =>
      if (t == tbl) {
        val bad = aligned.filter(col(c).isNotNull && size(col(c)) =!= dim)
        require(bad.isEmpty, s"vector dim mismatch for $t.$c (want $dim)")
      }
    }
    // assign ids ONCE, past the current max (deletes never shrink the
    // id space back: a freed max id may be reused only after the
    // delete's index rebuild, so no index ever sees a stale id)
    val maxId = target.agg(coalesce(max(col(Engine.RowId)), lit(-1L)))
      .first().getLong(0)
    val rows = aligned
      .withColumn(Engine.RowId, lit(maxId + 1) + monotonically_increasing_id())
      .cache()
    val cnt = rows.count()
    registerTable(tbl, table(tbl).unionAll(rows))
    // build any index that was created while the table was empty
    pendingIndexes.toSeq.filter(_._2._1 == tbl).foreach {
      case (name, (_, ddl)) =>
        pendingIndexes.remove(name)
        createIndex(ddl)
    }
    maintainIndexes(tbl, rows)
    // registerTable materialized the table cache (with the assigned
    // ids) while `rows`' cache was live — safe to release it now
    rows.unpersist() // the table's own cache covers it from here
    import spark.implicits._
    Seq(cnt).toDF(Engine.InsertRowsCol)
  }

  /** InsertVectorEntry semantics (vector_index.h:21, vector.04/05):
    * every vector index on the table sees the new rows. */
  private def maintainIndexes(tbl: String, rows: DataFrame): Unit =
    VectorIndexes.list().filter(_.table == tbl).foreach { meta =>
      val withId = table(tbl) // persistent ids, incl. the new batch
      meta.model match {
        case m: VectorIndexes.IvfModel =>
          // re-derive appended rows by id watermark: buckets hold all
          // previously indexed ids
          val indexed = m.m.buckets.select(col(Engine.RowId)).distinct()
          val fresh = withId.join(indexed, Seq(Engine.RowId), "left_anti")
            .filter(col(meta.column).isNotNull) // nulls are unindexable
            .select(col(Engine.RowId),
              col(meta.column).cast("array<double>"))
          val updated = m.m.insert(fresh)
          VectorIndexes.register(meta.copy(
            model = VectorIndexes.IvfModel(updated, Engine.RowId)))
        case h: VectorIndexes.HnswModel =>
          // watermark on the max INSERTED id, not idx.size: skipped
          // null-vector rows make size lag behind row ids, and a
          // size-based filter would re-insert already-indexed rows.
          // The collect below is bounded by the INSERT batch size (the
          // watermark keeps previously indexed rows out), matching the
          // reference's per-statement DML scale; a bulk-load path at
          // Hnsw.driverBuildLimit scale must build the index via
          // Hnsw.buildAuto instead of routing through DML inserts.
          withId.filter(col(Engine.RowId) > h.idx.maxId
              && col(meta.column).isNotNull)
            .select(col(Engine.RowId), col(meta.column).cast("array<double>"))
            .collect().foreach(r =>
              h.idx.insert(r.getLong(0), r.getSeq[Double](1).toArray))
        case _ => ()
      }
    }

  private def delete(sql: String, execute: Boolean = true): DataFrame = {
    val delRe = """(?is)delete\s+from\s+(\w+)(?:\s+where\s+(.*))?""".r
    val delRe(tbl, whereOrNull) = sql: @unchecked
    val t = table(tbl)
    val cond = Option(whereOrNull).map(w => expr(rewriteExprs(w)))
      .getOrElse(lit(true))
    if (!execute) // EXPLAIN: plan only, no effect, rid hidden
      return t.filter(cond).drop(Engine.RowId)
    val cnt = t.filter(cond).count()
    // null-evaluating predicates keep the row (3-valued DELETE)
    registerTable(tbl, t.filter(coalesce(!cond, lit(true))))
    rebuildIndexes(tbl)
    import spark.implicits._
    Seq(cnt).toDF(Engine.DeleteRowsCol)
  }

  private def update(sql: String, execute: Boolean): DataFrame = {
    val updRe = """(?is)update\s+(\w+)\s+set\s+(.*?)(?:\s+where\s+(.*))?""".r
    val updRe(tbl, setStr, whereOrNull) = sql: @unchecked
    val t = table(tbl)
    val cond = Option(whereOrNull).map(w => expr(rewriteExprs(w)))
      .getOrElse(lit(true))
    val assignments = splitTopLevel(setStr).map { a =>
      val Array(k, v) = a.split("=", 2).map(_.trim)
      k -> expr(rewriteExprs(v))
    }.toMap
    val updated = t.select(t.columns.map(c =>
      assignments.get(c)
        .map(e => when(cond, e).otherwise(col(c)).as(c))
        .getOrElse(col(c))): _*)
    if (!execute) // EXPLAIN: plan only, no effect, rid hidden
      return updated.drop(Engine.RowId)
    val cnt = t.filter(cond).count()
    // binder dim rule applies to updated vector columns too
    vectorDims.foreach { case ((tb, c), dim) =>
      if (tb == tbl && assignments.contains(c)) {
        val bad = updated.filter(col(c).isNotNull && size(col(c)) =!= dim)
        require(bad.isEmpty, s"vector dim mismatch for $tb.$c (want $dim)")
      }
    }
    registerTable(tbl, updated)
    rebuildIndexes(tbl)
    import spark.implicits._
    Seq(cnt).toDF(Engine.UpdateRowsCol)
  }

  /** SET/SHOW parity for reference session variables. Note
    * `force_optimizer_starter_rule` (reference optimizer.cpp:18-26):
    * accepted and echoed like any variable but deliberately a NO-OP —
    * there is no starter rule pipeline to force; Catalyst always plans
    * with its full rule set, which subsumes the reference's starter
    * rules (pushdown, join selection, TopN). */
  private def setVar(sql: String): DataFrame = {
    val Array(_, kv) = sql.split("\\s+", 2)
    val Array(k, v) = kv.split("=", 2).map(_.trim)
    spark.conf.set(s"graft.$k", v)
    message(s"set $k=$v")
  }

  private def showVar(sql: String): DataFrame = {
    val k = sql.split("\\s+", 2)(1).trim
    import spark.implicits._
    Seq(spark.conf.getOption(s"graft.$k").getOrElse(""))
      .toDF(k)
  }

  /** EXPLAIN (b|p|o|s) per the reference's stage options
    * (explain_statement.h): binder→analyzed, planner→sparkPlan,
    * optimizer→optimizedPlan, schema→output schema; no option = all. */
  private def explain(sql: String): DataFrame = {
    val optRe = """(?is)explain\s*\(([^)]*)\)\s*(.*)""".r
    val (opts, body) = sql match {
      case optRe(o, b) => (o.toLowerCase, b)
      case _ => ("", sql.replaceFirst("(?is)explain\\s*", ""))
    }
    val qe = plan(body, execute = false).queryExecution
    val tokens = opts.split("[,\\s]+").map(_.trim).filter(_.nonEmpty).toSet
    val planStr =
      if (tokens.contains("b")) qe.analyzed.toString
      else if (tokens.contains("o")) qe.optimizedPlan.toString
      else if (tokens.contains("p")) qe.sparkPlan.toString
      else if (tokens.contains("s")) qe.analyzed.schema.treeString
      else qe.toString
    import spark.implicits._
    planStr.linesIterator.toSeq.toDF("plan")
  }

  // ---- expression rewriting ----------------------------------------------

  /** pg-isms → Spark SQL: `ARRAY [..]` → array(..) (with double
    * literals, matching the binder's all-DECIMAL array rule,
    * array_expression.h:27-58) and the distance operators
    * (expression_factory.cpp:104-112). */
  private[graft] def rewriteExprs(sql: String): String = {
    // Mask single-quoted literals first: every rewrite below is
    // syntax-directed and must never touch user DATA (e.g. a value
    // containing ", from" or "<->"). Placeholders use a control char
    // no rewrite pattern can match; SQL's '' escape tokenizes as two
    // adjacent literals and restores identically.
    val lits = scala.collection.mutable.ArrayBuffer.empty[String]
    var out = "'[^']*'".r.replaceAllIn(sql, m => {
      lits += m.matched
      "\u0001" + (lits.length - 1) + "\u0001"
    })
    // the reference's pg parser tolerates a trailing comma before FROM
    // (p3.16-sort-limit.slt:347); Spark rejects it — normalize
    out = out.replaceAll("(?i),\\s+(?=from\\b)", " ")
    // the reference binder scopes an anonymous `(SELECT * FROM t ...)`
    // derived table under its base table's name (p3.19:115 joins on
    // `result.dst` through one); Spark needs the alias spelled out
    out = out.replaceAll(
      "(?is)\\(\\s*(select\\s+\\*\\s+from\\s+(\\w+)\\b[^()]*)\\)" +
        "(\\s+(?:inner\\s+|left\\s+|right\\s+)?join\\b)",
      "($1) $2$3")
    // ARRAY [1.0, 2.0] -> array(CAST(1.0 AS DOUBLE), ...)
    val arrRe = """(?i)ARRAY\s*\[([^\]]*)\]""".r
    out = arrRe.replaceAllIn(out, m =>
      Regex.quoteReplacement(
        "array(" + m.group(1).split(",")
          .map(x => s"CAST(${x.trim} AS DOUBLE)").mkString(", ") + ")"))
    // distance operators, loosest first (<#> before <> would not clash)
    out = rewriteOp(out, "<->", "l2_dist")
    out = rewriteOp(out, "<#>", "inner_product")
    out = rewriteOp(out, "<=>", "cosine_similarity")
    "\u0001(\\d+)\u0001".r.replaceAllIn(out, m =>
      Regex.quoteReplacement(lits(m.group(1).toInt)))
  }

  /** `a <op> b` → fn(a, b) for simple operands (identifier, function
    * call, or array(...) literal, one nesting level deep — enough for
    * the rewritten ARRAY [..] form) — covers the reference grammar,
    * where the operands are always a column and an ARRAY literal. */
  private def rewriteOp(sql: String, op: String, fn: String): String = {
    val inner = """(?:[^()]|\([^()]*\))*"""
    val operand = s"""(array\\($inner\\)|[\\w.]+\\($inner\\)|[\\w.]+)"""
    val re = new Regex("(?i)" + operand + """\s*""" + Regex.quote(op) +
      """\s*""" + operand)
    var out = sql
    var prev = ""
    while (prev != out) { // nested/multiple occurrences
      prev = out
      out = re.replaceAllIn(out, m =>
        Regex.quoteReplacement(s"$fn(${m.group(1)}, ${m.group(2)})"))
    }
    out
  }

  // ---- helpers ------------------------------------------------------------

  /** Stable row id for index bookkeeping — the RID analogue. Assigned
    * from `monotonically_increasing_id()` (partition-local counters —
    * unique, insertion-ordered, fully parallel; NOT contiguous, which
    * nothing requires) the first time rows enter the engine; existing
    * ids are always respected, so callers with their own id column
    * (parquet-scale tables) keep it. */
  private def withRowId(df: DataFrame): DataFrame =
    if (df.columns.contains(Engine.RowId)) df
    else df.withColumn(Engine.RowId, monotonically_increasing_id())

  private def message(s: String): DataFrame = {
    import spark.implicits._
    Seq(s).toDF("message")
  }

  /** split on commas not inside parens or brackets (ARRAY [..]) */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }
}

object Engine {
  val RowId = "__rid"
  /** reference __bustub_internal result column names */
  val InsertRowsCol = "insert_rows"
  val DeleteRowsCol = "delete_rows"
  val UpdateRowsCol = "update_rows"
}
