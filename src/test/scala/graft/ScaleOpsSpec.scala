package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** The layout/sketch operators' 100TB properties, asserted at test
  * scale: the bucketed join really is exchange-free, the partitioned
  * scan really prunes, the bloom probe really cuts the fact side
  * before the join — plus exact-equivalence of every fast path against
  * its straightforward twin. */
class ScaleOpsSpec extends SparkSpecBase {

  test("q83 bucketed join: SortMergeJoin with ZERO exchanges under it") {
    val plan = ScaleOps.bucketedJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("q83 bucketed join result == plain parquet join") {
    val bucketed = ScaleOps.queries("q83_bucketed_join")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val plain = Tables.load(spark, sfDir, "orders")
      .join(Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
      .collect().map(_.toSeq).toSet
    assert(bucketed == plain && bucketed.nonEmpty)
  }

  test("q84 single-day scan hits PartitionFilters (directory pruning)") {
    val plan = ScaleOps.prunedDayScan(spark, sfDir)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("event_date")), s"no partition filter:\n$plan")
    // the filter must NOT degrade to a post-scan row filter on the
    // partition column (that would read every directory)
    assert(!plan.contains("PartitionFilters: []"))
  }

  test("q85 bloom probe prunes the fact before the join, never drops a match") {
    val full = Tables.load(spark, sfDir, "lineitem")
    val pre = ScaleOps.bloomPrunedFact(spark, sfDir)
    val (n0, n1) = (full.count(), pre.count())
    assert(n1 < n0, s"bloom pruned nothing: $n1 of $n0")
    // plan shows the codegen'd might_contain predicate on the scan side
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // zero false NEGATIVES: every true match survives the probe
    val dimKeys = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 450000).select("o_orderkey")
    val trueMatches = full.join(
      dimKeys.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    val survivors = pre.join(
      dimKeys.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    assert(survivors == trueMatches)
  }

  test("q85 final result == plain semi-join (false positives verified away)") {
    val bloomed = ScaleOps.queries("q85_bloom_semi_join")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val dim = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 450000).select("o_orderkey")
    val plain = Tables.load(spark, sfDir, "lineitem")
      .join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,6)")).cast("double").as("qty"))
      .collect().map(_.toSeq).toSet
    assert(bloomed == plain && bloomed.nonEmpty)
  }

  test("q82 sketch gates hold (HLL within bound, p95 sketch within [p90,p99])") {
    val rows = ScaleOps.queries("q82_hll_sketch")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"), r.toString)
      assert(r.getAs[Boolean]("q_ok"), r.toString)
    }
  }

  test("q99 filtered KNN plans broadcast semi-join + TakeOrderedAndProject") {
    val plan = operators.VectorOps.queries("q99_filtered_knn")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the metadata filter prunes via a BROADCAST semi-join (the dim is
    // the small side), and top-k never global-sorts
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q91 TF-IDF joins the df vocabulary BROADCAST (corpus never reshuffled for it)") {
    val plan = operators.TextOps.queries("q91_tfidf_topterms")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q87 batch interval join: every attributed purchase is within the window") {
    val ev = Tables.load(spark, sfDir, "events")
    val pairs = ScaleOps.queries("q87_stream_interval_join")(spark, sfDir)
    val total = pairs.agg(sum("pairs")).head.getLong(0)
    // independent recount via SQL interval semantics
    ev.createOrReplaceTempView("ev_q87")
    val expect = spark.sql(
      """SELECT count(*) FROM
        |  (SELECT user_id, ts FROM ev_q87 WHERE event_type = 'view') v
        |  JOIN (SELECT user_id, ts FROM ev_q87 WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id AND p.ts >= v.ts
        |   AND p.ts <= v.ts + INTERVAL 30 MINUTES""".stripMargin)
      .head.getLong(0)
    assert(total == expect && total > 0)
  }

  test("q110 PageRank: co-partitioned path == broadcast path, rank for rank") {
    import spark.implicits._
    // a graph with hubs, chains and multi-edges folded by distinct
    val raw = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("a"),
        (col("l_suppkey") * 2 + 1).cast("long").as("b"))
      .distinct()
    val edges = raw.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
    def run(coPart: Boolean): Map[Long, Long] =
      ScaleOps.pageRankFixedPoint(edges, rounds = 5,
          forceCoPartition = Some(coPart))
        .as[(Long, Long)].collect().toMap
    val bcast = run(coPart = false)
    val coPart = run(coPart = true)
    assert(bcast.nonEmpty)
    assert(coPart == bcast) // fixed-point BIGINTs: exact, not approx
  }

  test("broadcastRowLimit: heap-derived, clamped, monotone in row width") {
    // r12 advice: the runtime broadcast gates must not hold a fixed
    // 10M-row cutoff regardless of driver heap — the cutoff derives
    // from maxMemory and clamps to [500k, 10M]
    val lim16 = ScaleOps.broadcastRowLimit(16)
    val lim24 = ScaleOps.broadcastRowLimit(24)
    assert(lim16 >= 500000L && lim16 <= 10000000L)
    assert(lim24 <= lim16, "wider rows must never allow MORE of them")
    // the heap budget (1/16th) over the per-row cost is the formula
    val expect = math.min(10000000L, math.max(500000L,
      Runtime.getRuntime.maxMemory() / 16 / (16 + 80)))
    assert(lim16 == expect)
  }

  test("q286 PPR: exact fixed-point recurrence on a 3-node path") {
    import spark.implicits._
    // undirected path a(1)–b(2)–c(3), seed {a}: share 1e10, restart
    // (15·1e10) div 100 = 1.5e9; two rounds traced by hand
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r1 = ScaleOps.pprFixedPoint(edges, seeds, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1500000000L, 2L -> 8500000000L, 3L -> 0L))
    val r2 = ScaleOps.pprFixedPoint(edges, seeds, rounds = 2)
      .as[(Long, Long)].collect().toMap
    // a: 1.5e9 + 85%·(8.5e9 div 2); b: 85%·1.5e9; c: 85%·(8.5e9 div 2)
    assert(r2 == Map(1L -> 5112500000L, 2L -> 1275000000L,
      3L -> 3612500000L))
    // personalization: mass stays near the seed (a > c at any depth)
    assert(r2(1L) > r2(3L))
  }

  test("q125 degree-oriented triangle count == naive id-order count") {
    val row = ScaleOps.queries("q125_triangle_count")(spark, sfDir).head()
    // independent recount, the textbook a<b<c way (fine at sf0.001)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = li.toDF("o", "u").join(li.toDF("o", "v"), "o")
      .filter(col("u") < col("v")).select("u", "v").distinct().cache()
    val naive = e.toDF("a", "b")
      .join(e.toDF("a", "c"), "a").filter(col("b") < col("c"))
      .join(e.toDF("b", "c"), Seq("b", "c")).count()
    assert(row.getAs[Long]("n_triangles") == naive)
    assert(row.getAs[Long]("n_edges") == e.count())
    val gcc = row.getAs[Double]("gcc")
    assert(gcc > 0.0 && gcc <= 1.0)
    e.unpersist()
  }

  test("q129 z-order tiles: box query prunes nearly all tiles, loses no rows") {
    // sf0.001's part table is too small for x to reach the probe box
    // (l_partkey < 512); sf0.01 populates the full 16x16 tile grid
    val zDir = "/root/testdata/sf0.01"
    val tiles = ScaleOps.queries("q129_zorder_tiles")(spark, zDir).collect()
    val (x0, x1, y0, y1) = (512L, 767L, 1024L, 1279L)
    val cand = tiles.filter { t =>
      t.getAs[Long]("max_x") >= x0 && t.getAs[Long]("min_x") <= x1 &&
      t.getAs[Long]("max_y") >= y0 && t.getAs[Long]("min_y") <= y1
    }.map(_.getAs[Long]("tile")).toSet
    // completeness: every row matching the box lives in a candidate tile
    val xCol = pmod(col("l_partkey"), lit(4096L))
    val yCol = pmod(col("l_orderkey"), lit(4096L))
    val hit = Tables.load(spark, zDir, "lineitem")
      .select(xCol.as("x"), yCol.as("y"),
        shiftright(ScaleOps.zval(xCol, yCol), 16).as("tile"))
      .filter(col("x").between(x0, x1) && col("y").between(y0, y1))
    assert(hit.count() > 0)
    val hitTiles = hit.select("tile").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(hitTiles.subsetOf(cand))
    // skipping power: the box touches a small corner of key space and
    // the z-clustered stats must reflect that
    assert(cand.size <= tiles.length / 8,
      s"${cand.size} candidates of ${tiles.length} tiles")
  }

  test("q139 snapshots: v1 stays row-identical to the base table after the v2 append") {
    import org.apache.spark.sql.functions._
    // running the query builds both versions (idempotent on re-run)
    val out = ScaleOps.queries("q139_snapshot_read")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = Tables.load(spark, sfDir, "documents")
    val nBase = base.count()
    assert(out(1)._1 == nBase) // v1 == base even though v2 files exist
    assert(out(2)._1 == nBase + base.filter(col("doc_id") % 10 === 0).count())
    // and the v1 snapshot is row-for-row the base table, not just counts
    val root = s"${Tables.scratchDir(sfDir)}/snapshots"
    val mf = new org.apache.hadoop.fs.Path(s"$root/manifest_v1.txt")
    val fs = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(mf)
    val files = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.split("\n").toSeq finally in.close()
    val v1 = spark.read.parquet(files: _*)
    val want = base.select("doc_id", "n_chars")
    assert(v1.exceptAll(want).isEmpty && want.exceptAll(v1).isEmpty)
  }

  test("q139 snapshots: a stale base signature forces a rebuild, never a stale serve") {
    import org.apache.spark.sql.functions._
    // first run materializes the layout + signature
    ScaleOps.queries("q139_snapshot_read")(spark, sfDir).collect()
    val sigPath = new org.apache.hadoop.fs.Path(
      s"${Tables.scratchDir(sfDir)}/snapshots/_base_sig")
    val fs = sigPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a driver-regenerated base table: the recorded signature
    // no longer matches the live one. forget() drops the per-JVM
    // validation memo — a real regeneration arrives with a NEW driver
    // process, which starts with an empty memo.
    val out = fs.create(sigPath, true)
    try out.write("stale_generation".getBytes("UTF-8")) finally out.close()
    operators.ScratchGuard.forget(
      s"${Tables.scratchDir(sfDir)}/snapshots")
    val res = ScaleOps.queries("q139_snapshot_read")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nBase = Tables.load(spark, sfDir, "documents").count()
    assert(res(1) == nBase, "v1 must be rebuilt from the live table")
    // and the rebuild re-recorded the live signature
    val in = fs.open(sigPath)
    val sig = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(sig != "stale_generation" && sig.contains("_"))
  }

  test("q135 skyline: partition-independent, tie-correct vs brute dominance") {
    import spark.implicits._
    // adversarial fixture: exact price ties, exact (price,size) ties
    // (both must survive — no strict dominator), a dominated row that
    // shares its price with a frontier row, and a strictly-better
    // later row; spread across partitionings so a dominator and its
    // victim land in different partitions
    val pts = Seq(
      (1L, 10.0, 5), (2L, 10.0, 5), // tie on both dims: both kept
      (3L, 10.0, 4),                // same price, smaller: dropped
      (4L, 12.0, 5),                // pricier, size only equal: dropped
      (5L, 12.0, 7),                // frontier
      (6L, 8.0, 2),                 // frontier (cheapest)
      (7L, 9.0, 2),                 // dominated by 6 (equal size, pricier)
      (8L, 15.0, 9), (9L, 20.0, 9)  // 8 frontier, 9 dominated by 8
    )
    val expect = Set(1L, 2L, 5L, 6L, 8L)
    val brute = for {
      p <- pts if !pts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    } yield p._1
    assert(brute.toSet == expect) // fixture sanity
    for (parts <- Seq(1, 2, 7)) {
      val got = ScaleOps.skyline(
          pts.toDF("k", "price", "sz").repartition(parts))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(got == expect, s"parts=$parts got $got")
    }
  }

  test("q148 k-anonymity: class accounting closes against the table") {
    val r = ScaleOps.queries("q148_k_anonymity")(spark, sfDir).head()
    val nCustomers = graft.Tables.load(spark, sfDir, "customer").count()
    assert(r.getAs[Long]("n_rows") == nCustomers) // classes partition rows
    assert(r.getAs[Long]("k_min") >= 1)
    assert(r.getAs[Long]("classes_lt5") <= r.getAs[Long]("n_classes"))
    assert(r.getAs[Long]("rows_at_risk") <= nCustomers)
    // every at-risk class contributes 1..4 rows
    val (c5, rar) = (r.getAs[Long]("classes_lt5"), r.getAs[Long]("rows_at_risk"))
    assert(rar >= c5 && rar <= 4 * c5)
  }

  test("q150 sessions: gap boundary is strict (> 8h), ties by event_id") {
    import spark.implicits._
    val H = 3600L * 1000000L
    // user 1: second event EXACTLY 8h later (same session — strict >),
    // third 8h+1us after that (new session). user 2: one event.
    val ev = Seq(
      (1L, 10L, 0L), (1L, 11L, 8 * H), (1L, 12L, 16 * H + 1),
      (2L, 20L, 5L))
      .toDF("user_id", "event_id", "us")
    val sess = ScaleOps.sessionsOf(ev)
      .orderBy("user_id", "sess_id").collect()
    assert(sess.length == 3)
    val u1 = sess.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
    assert(u1.head.getAs[Long]("a_us") == 0L
      && u1.head.getAs[Long]("b_us") == 8 * H)
  }

  test("q154 sweep-line: touching sessions count as concurrent; peak is earliest") {
    import spark.implicits._
    // intervals: [0,10], [10,20] touch at 10 (concurrent -> 2);
    // [5,8] overlaps the first -> peak 2 FIRST attained at t=5;
    // [30,40] alone. Peak=2 at t=5 (earliest attaining instant).
    val sess = Seq(
      (1L, 1L, 0L, 10L, 3L), (1L, 2L, 10L, 20L, 2L),
      (2L, 1L, 5L, 8L, 1L), (3L, 1L, 30L, 40L, 4L))
      .toDF("user_id", "sess_id", "a_us", "b_us", "n_events")
    for (parts <- Seq(1, 3)) {
      val r = ScaleOps.peakConcurrency(sess.repartition(parts)).head()
      assert(r.getAs[Long]("peak_concurrency") == 2L, s"parts=$parts")
      assert(r.getAs[Long]("at_us") == 5L, s"parts=$parts")
      assert(r.getAs[Long]("n_sessions") == 4L)
    }
  }

  test("q157 LPA round: frequency beats label order; ties pick smallest") {
    import spark.implicits._
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (1L, 8L), (3L, 8L))
      .toDF("src", "dst")
    // node 9 sees labels {7, 7, 5}: frequency wins -> 7 (despite 5 < 7)
    // node 8 sees labels {7, 5}: tie -> smallest -> 5
    val labels = Seq((1L, 7L), (2L, 7L), (3L, 5L)).toDF("v", "lbl")
    val got = ScaleOps.lpaRound(edges, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(9L -> 7L, 8L -> 5L))
  }

  test("q159 cosine: identical interaction vectors score 1.0") {
    import spark.implicits._
    // sanity on the exact-integer dot/norm path: a pair of event types
    // with identical per-user count vectors must measure cosine == 1
    val r = ScaleOps.queries("q159_item_cosine")(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val c = row.getAs[Double]("cosine")
      assert(c >= 0.0 && c <= 1.0, row.toString)
    }
    val uc = graft.Tables.load(spark, sfDir, "events")
      .groupBy("user_id", "event_type").count()
      .withColumn("event_type", lit("clone_a"))
    // direct unit check on the formula with a constructed clone pair
    val dots = uc.select(sum(col("count") * col("count"))).head.getLong(0)
    assert(math.abs(dots.toDouble
      / (math.sqrt(dots.toDouble) * math.sqrt(dots.toDouble)) - 1.0) < 1e-12)
  }

  test("q160 hop windows: every event lands in exactly 2 windows") {
    val total = graft.Tables.load(spark, sfDir, "events").count()
    val winSum = ScaleOps.queries("q160_hop_windows")(spark, sfDir)
      .agg(sum("n")).head.getLong(0)
    assert(winSum == 2 * total)
  }

  test("q165 IVM: three delta terms + materialized base == full join") {
    val r = ScaleOps.queries("q165_ivm_join")(spark, sfDir).head()
    assert(r.getAs[Boolean]("inc_eq_full"),
      "incrementally maintained join must equal the full recompute")
    assert(r.getAs[Long]("n_total")
      == r.getAs[Long]("n_base") + r.getAs[Long]("n_delta"))
    assert(r.getAs[Long]("n_delta") > 0, "fixture must exercise deltas")
  }

  test("q152/q158/q166/q171: cross-query closure invariants") {
    // q152: every event carries a parseable props.k
    val j = ScaleOps.queries("q152_json_extract")(spark, sfDir).collect()
    j.foreach(r => assert(r.getAs[Long]("n_k") == r.getAs[Long]("n")))
    val nEv = graft.Tables.load(spark, sfDir, "events").count()
    assert(j.map(_.getAs[Long]("n")).sum == nEv)
    // q158: diversity bounded by class size and the segment domain
    val ld = ScaleOps.queries("q158_l_diversity")(spark, sfDir).head()
    assert(ld.getAs[Long]("l_min") >= 1)
    assert(ld.getAs[Long]("rows_at_risk")
      >= ld.getAs[Long]("classes_lt3"))
    // q166: top motifs are well-formed trigrams over known types
    val types = graft.Tables.load(spark, sfDir, "events")
      .select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    val m = ScaleOps.queries("q166_event_motifs")(spark, sfDir).collect()
    assert(m.nonEmpty && m.length <= 20)
    m.foreach { r =>
      val parts = r.getAs[String]("motif").split(">")
      assert(parts.length == 3 && parts.forall(types.contains), r.toString)
      assert(r.getAs[Long]("n") > 0)
    }
    // q171: generations reunite to the full corpus; lang only on gen2
    val se = ScaleOps.queries("q171_schema_evolution")(spark, sfDir)
      .collect()
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    assert(se.map(_.getAs[Long]("docs")).sum == nDocs)
    se.foreach(r =>
      assert(r.getAs[Long]("docs_with_lang") <= r.getAs[Long]("docs")))
  }

  test("q181 negative sampling: clean, full quota, deterministic") {
    val a = ScaleOps.queries("q181_negative_edges")(spark, sfDir).head()
    assert(a.getAs[Boolean]("clean") && a.getAs[Long]("real_hits") == 0)
    // sf0.001's bipartite graph is nearly complete (150×10 pairs),
    // so the quota can't fill — the sample is whatever survives
    assert(a.getAs[Long]("n_selected") > 0
      && a.getAs[Long]("n_selected") <= 1000)
    val b = ScaleOps.queries("q181_negative_edges")(spark, sfDir).head()
    assert(a.getAs[Long]("sample_xor") == b.getAs[Long]("sample_xor"),
      "sample must be reproducible run to run")
  }

  test("q179 group folds: zero leakage, folds partition the events") {
    val rows = ScaleOps.queries("q179_group_folds")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("fold")).toSet.subsetOf((0 to 4).toSet))
    assert(rows.forall(_.getAs[Long]("leaked_users") == 0))
    val ev = graft.Tables.load(spark, sfDir, "events")
    assert(rows.map(_.getAs[Long]("events")).sum == ev.count())
    assert(rows.map(_.getAs[Long]("users")).sum
      == ev.select("user_id").distinct().count())
  }

  test("q180 KS statistic equals a driver-side brute recomputation") {
    import spark.implicits._
    val r = ScaleOps.queries("q180_ks_drift")(spark, sfDir).head()
    val vals = graft.Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").as[(String, Double)].collect()
    val a = vals.filter(_._1 == "click").map(_._2).sorted
    val b = vals.filter(_._1 == "view").map(_._2).sorted
    val merged = (a.map((_, 1)) ++ b.map((_, 2))).sortBy(_._1)
    var (c1, c2) = (0L, 0L)
    var best = 0L
    // evaluate after absorbing ALL rows of each distinct value
    merged.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      c1 += g.count(_._2 == 1); c2 += g.count(_._2 == 2)
      best = math.max(best, math.abs(c1 * b.length - c2 * a.length))
    }
    assert(r.getAs[Long]("ks_num") == best)
    assert(r.getAs[Long]("n1") == a.length && r.getAs[Long]("n2") == b.length)
    val ks = r.getAs[Double]("ks")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("q176 TWAP: bounded by each user's observed values; spans close") {
    import spark.implicits._
    val rows = ScaleOps.queries("q176_twap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val minMax = graft.Tables.load(spark, sfDir, "events")
      .groupBy("user_id").agg(min("value").as("lo"), max("value").as("hi"))
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    rows.foreach { r =>
      val (lo, hi) = minMax(r.getAs[Long]("user_id"))
      val t = r.getAs[Double]("twap")
      assert(t >= lo - 1e-6 && t <= hi + 1e-6, r.toString)
      assert(r.getAs[Long]("span_us") > 0)
    }
  }

  test("q174 point-in-time join: SCD2 intervals attribute every event once") {
    val rows = ScaleOps.queries("q174_pit_join")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("tiling_exact")),
      "every event must match exactly one dimension version")
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == graft.Tables.load(spark, sfDir, "events").count())
    // Independent per-event cardinality check (the gate inside the
    // query now pins this too, but re-derive it here so the spec
    // doesn't trust the query's own flag): rebuild the PIT join and
    // assert min == max == 1 matches per event id.
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ets"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
    val dim = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("state"),
        col("us").as("valid_from_us"), col("valid_to_us"))
    val card = ev.join(dim,
        ev("user_id") === dim("user_id")
          && col("valid_from_us") <= col("ets")
          && (col("valid_to_us").isNull || col("ets") < col("valid_to_us")))
      .groupBy(ev("event_id")).count()
      .agg(min("count").as("lo"), max("count").as("hi"),
        count(lit(1)).as("n")).head()
    assert(card.getAs[Long]("lo") == 1L && card.getAs[Long]("hi") == 1L,
      s"per-event match cardinality must be exactly 1: $card")
    assert(card.getAs[Long]("n") ==
      graft.Tables.load(spark, sfDir, "events").count())
  }

  test("q175 table profile: key column is unique and null-free") {
    val p = ScaleOps.queries("q175_table_profile")(spark, sfDir)
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val key = p("c_custkey")
    assert(key.getAs[Long]("nulls") == 0)
    assert(key.getAs[Long]("ndv") == key.getAs[Long]("n_rows"))
    assert(p("c_mktsegment").getAs[Long]("ndv") <= 5)
  }

  test("q172 snapshot diff: append-only versions diff as pure adds") {
    val r = ScaleOps.queries("q172_snapshot_diff")(spark, sfDir).head()
    assert(r.getAs[Long]("removed") == 0 && r.getAs[Long]("changed") == 0)
    assert(r.getAs[Long]("n_v2")
      == r.getAs[Long]("n_v1") + r.getAs[Long]("added"))
    assert(r.getAs[Long]("unchanged") == r.getAs[Long]("n_v1"))
  }

  test("q173 consistent hashing: reshard moves a small fraction, not 15/17") {
    val r = ScaleOps.queries("q173_consistent_hash")(spark, sfDir).head()
    val frac = r.getAs[Double]("moved_frac")
    // contract: ~1/(S+1) ≈ 0.059 expected; naive mod-hash moves ~0.88.
    // generous band for single-point-per-shard variance
    assert(frac > 0.0 && frac < 0.25, s"moved_frac $frac")
  }

  test("q167 anomaly days: flags only |z| > 2 after a full trailing week") {
    val rows = ScaleOps.queries("q167_anomaly_days")(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixture should produce at least one anomaly")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) > 2, r.toString)
      assert(r.getAs[Long]("n") >= 0 && r.getAs[Int]("day_epoch") > 19700,
        r.toString) // events live in 2024
    }
  }

  test("q163 outlier trim: bounds ordered, ~1% tails, mean inside bounds") {
    val rows = ScaleOps.queries("q163_outlier_trim")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n"),
        r.getAs[Double]("p_lo"), r.getAs[Double]("p_hi"))
      assert(lo <= hi, r.toString)
      val m = r.getAs[Double]("trimmed_mean")
      assert(m >= lo && m <= hi, r.toString)
      // rank-based 1% tails: each side keeps at most ~2% of rows
      assert(r.getAs[Long]("n_out_low") <= n / 50 + 1, r.toString)
      assert(r.getAs[Long]("n_out_high") <= n / 50 + 1, r.toString)
    }
  }

  test("q164 gap-fill: span closes, longest run matches a brute replay") {
    val rows = ScaleOps.queries("q164_gap_fill")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("span_days")
        == r.getAs[Long]("active_days") + r.getAs[Long]("zero_days"))
      assert(r.getAs[Long]("longest_zero_run") <= r.getAs[Long]("zero_days"))
    }
    // brute per-user replay from raw events (driver-side, sf0.001 only)
    val days = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.toEpochDay))
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val ds = days(uid).map(_.toEpochDay)
      val span = ds.last - ds.head + 1
      assert(r.getAs[Long]("span_days") == span, s"user $uid")
      assert(r.getAs[Long]("active_days") == ds.length, s"user $uid")
      val longest =
        if (ds.length < 2) 0L
        else ds.toSeq.sliding(2).map(p => p(1) - p(0) - 1).max
      assert(r.getAs[Long]("longest_zero_run") == longest, s"user $uid")
    }
  }

  test("q153 SCD2: versions tile each user's history, one current each") {
    val v = ScaleOps.queries("q153_scd2_history")(spark, sfDir)
      .collect().groupBy(_.getAs[Long]("user_id"))
    assert(v.nonEmpty)
    for ((_, rows) <- v) {
      val sorted = rows.sortBy(_.getAs[Long]("valid_from_us"))
      // exactly one open (current) version, and it is the last
      assert(rows.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      // each version closes exactly where the next opens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us")
            == b.getAs[Long]("valid_from_us"))
        case _ => ()
      }
      // consecutive versions always change state (dup-collapse held)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("state") != b.getAs[String]("state"))
        case _ => ()
      }
    }
  }

  test("q187 AUC: tie correction and degenerate closures on crafted rows") {
    import spark.implicits._
    def auc(rows: (Double, Long)*): (Long, Double) = {
      val r = ScaleOps.aucExact(rows.toDF("score", "p")).head()
      (r.getAs[Long]("auc_num"), r.getAs[Double]("auc"))
    }
    // perfect ranking (all positives above all negatives) -> 1
    assert(auc((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L))._2 == 1.0)
    // reversed ranking -> 0
    assert(auc((1.0, 1L), (2.0, 1L), (3.0, 0L), (4.0, 0L))._2 == 0.0)
    // every score tied -> 0.5 exactly (the average-rank correction;
    // counting concordant pairs without it would read 0 or 1)
    assert(auc((5.0, 1L), (5.0, 0L), (5.0, 1L), (5.0, 0L))._2 == 0.5)
    // hand-checked mixed case: scores 1(-),2(+),2(-),3(+) — pairs:
    // (2+,1-)=1, (2+,2-)=0.5, (3+,1-)=1, (3+,2-)=1 -> AUC = 3.5/4
    val (num, a) = auc((1.0, 0L), (2.0, 1L), (2.0, 0L), (3.0, 1L))
    assert(num == 7L && a == 0.875) // auc_num = 2 * 3.5
    // label flip complements: AUC(p) + AUC(1-p) = 1
    val flipped = auc((1.0, 1L), (2.0, 0L), (2.0, 1L), (3.0, 0L))._2
    assert(math.abs(a + flipped - 1.0) < 1e-12)
  }

  test("q191 average precision: ranking closures on crafted rows") {
    import spark.implicits._
    def ap(rows: (Double, Long, Long)*): Double =
      ScaleOps.averagePrecision(rows.toDF("score", "k", "p"))
        .head().getAs[Double]("ap")
    // all positives ranked first -> 1
    assert(ap((9.0, 1L, 1L), (8.0, 2L, 1L), (1.0, 3L, 0L)) == 1.0)
    // single positive ranked LAST of 4 -> precision 1/4
    assert(ap((4.0, 1L, 0L), (3.0, 2L, 0L), (2.0, 3L, 0L),
      (1.0, 4L, 1L)) == 0.25)
    // hand-checked mixed: order p = 1,0,1 -> (1/1 + 2/3)/2:
    // (1 + 0.666666667) / 2 = 0.8333333335, HALF_UP -> ...334
    assert(ap((3.0, 1L, 1L), (2.0, 2L, 0L), (1.0, 3L, 1L))
      == 0.833333334)
    // tied scores resolve by key asc in BOTH engines: moving the
    // positive to the smaller key inside a tie changes AP as the
    // deterministic order dictates
    val tieFirst = ap((5.0, 1L, 1L), (5.0, 2L, 0L))
    val tieLast = ap((5.0, 2L, 1L), (5.0, 3L, 0L))
    assert(tieFirst == 1.0 && tieLast == 1.0)
    assert(ap((5.0, 2L, 1L), (5.0, 1L, 0L)) == 0.5)
  }

  test("q195 t-closeness: closed-form corners on crafted classes") {
    import spark.implicits._
    def per(rows: (Long, Long, String)*) =
      ScaleOps.tClosenessPerClass(rows.toDF("nat", "bal_band", "seg"))
        .collect().map(r => (r.getAs[Long]("nat"),
          r.getAs[Long]("tnum"), r.getAs[Double]("t")))
    // one class = the global distribution -> t = 0 exactly
    val solo = per((1L, 0L, "A"), (1L, 0L, "A"), (1L, 0L, "B"))
    assert(solo.length == 1 && solo.head._2 == 0L && solo.head._3 == 0.0)
    // two classes, each pure in a different value, 50/50 global:
    // t = (|1-.5| + |0-.5|) / 2 = 0.5 for BOTH
    val split = per((1L, 0L, "A"), (1L, 0L, "A"),
      (2L, 0L, "B"), (2L, 0L, "B"))
    assert(split.length == 2 && split.forall(_._3 == 0.5), split.toSeq)
    // skewed global 3:1, pure-minority class: t = |1-.25|+|0-.75| / 2
    val skew = per((1L, 0L, "A"), (1L, 0L, "A"), (1L, 0L, "A"),
      (2L, 0L, "B"))
    val minority = skew.find(_._1 == 2L).get
    assert(minority._3 == 0.75, skew.toSeq)
  }

  test("q197 k-core: chain cascade peels one node per round; clique corners") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + tail chain 4-5-6-7
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    def core(k: Int) = {
      val r = ScaleOps.kCore(edges, k).collect().head
      (r.getAs[Long]("n_core"), r.getAs[Long]("n_core_edges"),
        r.getAs[Long]("id_sum"), r.getAs[Int]("rounds"))
    }
    // k=2: the chain peels ONE node per round (7, then 6, then 5) —
    // the cascade the round counter must see: 3 removing + 1 confirming
    assert(core(2) == ((4L, 6L, 10L, 4)))
    // k=3: both bare chain nodes drop together in round 1
    assert(core(3) == ((4L, 6L, 10L, 2)))
    // k=4: node 4 (3 clique edges + the chain) survives round 1
    // alone, starves in round 2, round 3 confirms the empty fixpoint
    assert(core(4) == ((0L, 0L, 0L, 3)))
  }

  test("q198 link prediction: path, 4-cycle and triangle corners") {
    import spark.implicits._
    def predict(und: (Long, Long)*) =
      ScaleOps.linkPredict(und.toDF("u", "v")).collect()
        .map(r => ((r.getAs[Long]("u"), r.getAs[Long]("v")),
          (r.getAs[Long]("cn"), r.getAs[Double]("ra")))).toMap
    // path 1-2-3: the endpoints share center 2 (deg 2) -> ra = 0.5
    assert(predict((1L, 2L), (2L, 3L)) == Map((1L, 3L) -> ((1L, 0.5))))
    // 4-cycle: each diagonal has TWO degree-2 centers -> cn 2, ra 1.0
    val cyc = predict((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(cyc == Map((1L, 3L) -> ((2L, 1.0)), (2L, 4L) -> ((2L, 1.0))))
    // triangle: every wedge closes into an existing edge -> nothing
    assert(predict((1L, 2L), (2L, 3L), (1L, 3L)).isEmpty)
    // star K1,3: leaf pairs share the degree-3 hub -> ra rounds to
    // 0.333333333 exactly (the 9-dp DECIMAL term, not 1/3)
    val star = predict((1L, 10L), (2L, 10L), (3L, 10L))
    assert(star.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(star.values.forall(_ == ((1L, 0.333333333))))
  }

  test("q200 HITS: hand-walked alternating-path counts on a 2x2 graph") {
    import spark.implicits._
    // customers {1,2}, suppliers {10,20}; 1->10, 1->20, 2->10
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("c", "sp")
    val (a, h) = ScaleOps.hitsScores(e, rounds = 3)
    val am = a.collect().map(r =>
      r.getAs[Long]("sp") -> r.getAs[Long]("score")).toMap
    val hm = h.collect().map(r =>
      r.getAs[Long]("c") -> r.getAs[Long]("score")).toMap
    // a1 = {10:2, 20:1}; h1 = {1:3, 2:2}; a2 = {10:5, 20:3};
    // h2 = {1:8, 2:5}; a3 = {10:13, 20:8}; h3 = {1:21, 2:13}
    assert(am == Map(10L -> 13L, 20L -> 8L))
    assert(hm == Map(1L -> 21L, 2L -> 13L))
    // one round = pure degree / degree-sum (the recurrence's base)
    val (a1, h1) = ScaleOps.hitsScores(e, rounds = 1)
    assert(a1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(10L -> 2L, 20L -> 1L))
    assert(h1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(1L -> 3L, 2L -> 2L))
    // the shuffle-join path (past-broadcast node counts) is score-
    // identical — the broadcast is a shape choice, never semantics
    val (a2, h2) = ScaleOps.hitsScores(e, rounds = 3,
      broadcastScores = false)
    assert(a2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == am)
    assert(h2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == hm)
  }

  test("q201 butterflies: K_{a,b} closed forms and a butterfly-free order") {
    import spark.implicits._
    def stats(rows: (Long, Long)*) = {
      val r = ScaleOps.butterflyStats(rows.toDF("o", "p")).collect().head
      (r.getAs[Long]("wedge_pairs"), r.getAs[Long]("wedges"),
        r.getAs[Long]("butterflies"), r.getAs[Long]("max_codeg"))
    }
    // K_{2,2}: two orders share parts {1,2} -> exactly one butterfly
    assert(stats((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
      == ((1L, 2L, 1L, 2L)))
    // K_{3,2}: C(3,2)*C(2,2) = 3 butterflies through one part pair
    assert(stats((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L)) == ((1L, 3L, 3L, 3L)))
    // K_{2,3}: C(2,2)*C(3,2) = 3 butterflies across three part pairs
    assert(stats((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L)) == ((3L, 6L, 3L, 2L)))
    // one order with 3 parts: wedges but zero butterflies
    assert(stats((1L, 1L), (1L, 2L), (1L, 3L)) == ((3L, 3L, 0L, 1L)))
  }

  test("q203 SSSP: cheaper two-hop route wins; convergence is detectable") {
    import spark.implicits._
    def sym(und: (Long, Long, Long)*) =
      (und ++ und.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")
    val seeds = Seq((0L, 0L)).toDF("v", "dist")
    // triangle: direct 0-2 costs 100, the 0-1-2 detour costs 20
    val tri = sym((0L, 1L, 10L), (1L, 2L, 10L), (0L, 2L, 100L))
    val (d1, d2) = ScaleOps.ssspRounds(tri, seeds, rounds = 2)
    val after1 = d1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after2 = d2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after1 == Map(0L -> 0L, 1L -> 10L, 2L -> 100L))
    assert(after2 == Map(0L -> 0L, 1L -> 10L, 2L -> 20L),
      "the relaxation must replace the expensive direct edge")
    // unit chain 0-1-2-3-4: round r reaches node r — an undersized
    // round budget shows as round R vs R-1 still differing
    val chain = sym((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val (c2, c3) = ScaleOps.ssspRounds(chain, seeds, rounds = 3)
    assert(c2.count() == 3 && c3.count() == 4, "frontier grows per round")
    val (c4, c5) = ScaleOps.ssspRounds(chain, seeds, rounds = 5)
    assert(c4.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .sameElements(c5.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted), "diameter+1 rounds: fixpoint reached")
    assert(c5.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("q204 FD audit: key holds, violated dependency counts exact mass") {
    import spark.implicits._
    val df = Seq((1L, "a", 10L), (1L, "a", 11L), (2L, "b", 10L),
      (2L, "c", 10L), (2L, "c", 12L), (3L, "d", 13L))
      .toDF("k", "s", "x")
    def audit(lhs: Seq[String], rhs: String) = {
      val r = ScaleOps.fdAudit(df, "t", lhs, rhs).collect().head
      (r.getAs[Long]("n_lhs"), r.getAs[Long]("violating_lhs"),
        r.getAs[Long]("violating_rows"), r.getAs[Boolean]("holds"))
    }
    // k -> s: group 2 sees {b, c} -> 3 violating rows; 1 and 3 clean
    assert(audit(Seq("k"), "s") == ((3L, 1L, 3L, false)))
    // (k, s) -> x: (1,a) sees {10,11}, (2,c) sees {10,12} -> 4 rows
    assert(audit(Seq("k", "s"), "x") == ((4L, 2L, 4L, false)))
    // s -> k HOLDS (each letter maps to exactly one k)
    assert(audit(Seq("s"), "k") == ((4L, 0L, 0L, true)))
  }

  test("q205 permutation test: ties count as extreme; planted gap is rare") {
    import spark.implicits._
    def pool(rows: (Long, String, Long)*) =
      rows.toDF("doc_id", "source", "x")
    def run(p: org.apache.spark.sql.DataFrame) = {
      val r = ScaleOps.permTest(p, "A", "B").collect().head
      (r.getAs[Long]("obs_scaled"), r.getAs[Long]("n_extreme"),
        r.getAs[Double]("p_value"))
    }
    // all-equal pool: every non-degenerate permutation TIES the
    // observed 0 — >= must include equality, so p reads ~1
    val flat = run(pool((1L to 20L).map(i =>
      (i, if (i <= 10) "A" else "B", 5L)): _*))
    assert(flat._1 == 0L && flat._2 >= 95L,
      s"ties must count as extreme: $flat")
    assert(flat._3 == BigDecimal((flat._2 + 1).toDouble / 101)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // maximal planted difference: only a parity split that exactly
    // reproduces the partition (or its complement) can match
    val gap = run(pool((1L to 20L).map(i =>
      (i, if (i <= 10) "A" else "B", if (i <= 10) 1000000L else 0L)): _*))
    assert(gap._2 <= 2L && gap._3 <= 0.0297030,
      s"a 1e6x gap should be near-unreproducible by parity: $gap")
  }

  test("q206 bootstrap: Poisson inversion corners; constant column -> zero-width CI") {
    import spark.implicits._
    // the generated CASE inverts the lambda=1 CDF at its thresholds
    val cases = ScaleOps.poissonCaseSql("u")
    val probe = Seq(0.0, 0.3678794411, 0.3678794413, 0.73575888,
      0.9196986, 0.999, 0.99999).toDF("u")
      .selectExpr(s"$cases AS w").collect().map(_.getInt(0)).toSeq
    assert(probe == Seq(0, 0, 1, 1, 2, 5, 7))
    // a constant column: EVERY replicate mean is exactly that
    // constant, so the CI has zero width and equals the mean
    val flat = ScaleOps.bootstrapCi(
      (1L to 50L).map(i => (i, 7L)).toDF("doc_id", "x"))
      .collect().head
    assert(flat.getAs[Double]("mean_obs") == 7.0)
    assert(flat.getAs[Double]("ci_lo") == 7.0)
    assert(flat.getAs[Double]("ci_hi") == 7.0)
    assert(flat.getAs[Long]("n_replicates") == 100L)
    // a spread column: the CI brackets the observed mean
    val spread = ScaleOps.bootstrapCi(
      (1L to 200L).map(i => (i, i % 13)).toDF("doc_id", "x"))
      .collect().head
    assert(spread.getAs[Double]("ci_lo")
      <= spread.getAs[Double]("mean_obs"))
    assert(spread.getAs[Double]("ci_hi")
      >= spread.getAs[Double]("mean_obs"))
    assert(spread.getAs[Double]("ci_lo") < spread.getAs[Double]("ci_hi"))
  }

  test("q189 per-segment AUC equals the q187 sweep run on each slice") {
    // two independent constructions of the same statistic: the
    // declarative per-group window (q189) and the DistributedPrefix
    // scalar sweep (q187) applied to one segment's subset
    val seg = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val scored = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_totalprice").as("score"),
        when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L)
          .as("p"))
      .join(seg, col("o_custkey") === col("c_custkey"))
    val grouped = ScaleOps.queries("q189_group_auc")(spark, sfDir)
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    assert(grouped.size >= 3)
    grouped.foreach { case (sg, row) =>
      val solo = ScaleOps.aucExact(
        scored.filter(col("segment") === sg).select("score", "p")).head()
      assert(row.getAs[Long]("n_pos") == solo.getAs[Long]("n_pos"), sg)
      assert(row.getAs[Long]("n_neg") == solo.getAs[Long]("n_neg"), sg)
      assert(row.getAs[Long]("auc_num") == solo.getAs[Long]("auc_num"), sg)
      assert(row.getAs[Double]("auc") == solo.getAs[Double]("auc"), sg)
    }
  }

  test("boruvka msf: triangle drops the heavy edge; chain contracts in one round") {
    import spark.implicits._
    def msf(es: Seq[(Long, Long, Long)]) =
      ScaleOps.boruvkaMsf(es.toDF("u", "v", "w"), rounds = 5, jumps = 6)
        .head()
    // triangle: MST = the two lightest edges, exact checksum
    val tri = msf(Seq((1L, 2L, 5L), (2L, 3L, 3L), (1L, 3L, 9L)))
    assert(tri.getAs[Long]("n_tree_edges") == 2L)
    assert(tri.getAs[Long]("total_weight") == 8L)
    assert(tri.getAs[Long]("edge_checksum") == 3000005L)
    assert(tri.getAs[Boolean]("forest_valid")
      && tri.getAs[Boolean]("fully_contracted")
      && tri.getAs[Boolean]("converged"))
    // increasing-weight path: the merge forest is a DEEP chain — the
    // pointer-jump budget must close it; all 5 edges are tree edges
    val chain = msf((1L to 5L).map(i => (i, i + 1, i)))
    assert(chain.getAs[Long]("n_tree_edges") == 5L)
    assert(chain.getAs[Long]("total_weight") == 15L)
    assert(chain.getAs[Long]("n_components") == 1L)
    assert(chain.getAs[Boolean]("fully_contracted")
      && chain.getAs[Boolean]("converged"))
    // two disconnected triangles: a spanning FOREST, 2 components
    val forest = msf(Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 7L),
      (10L, 11L, 4L), (11L, 12L, 5L), (10L, 12L, 9L)))
    assert(forest.getAs[Long]("n_components") == 2L)
    assert(forest.getAs[Long]("n_tree_edges") == 4L)
    assert(forest.getAs[Long]("total_weight") == 12L)
    assert(forest.getAs[Boolean]("forest_valid"))
    // single mutual-min pair: the 2-cycle break roots the smaller id
    val pair = msf(Seq((7L, 8L, 42L)))
    assert(pair.getAs[Long]("n_tree_edges") == 1L)
    assert(pair.getAs[Boolean]("converged"))
    // EXACT-budget convergence: the 6-node chain's round-1 merge
    // pointer chain has depth 5, idempotent exactly at jump 3
    // (2^3 >= 5 > 2^2) — the lagged in-loop check cannot see that,
    // so the post-loop explicit check must report full contraction
    // (the 1M ring harness converges on its last allowed jump the
    // same way)
    val tight = ScaleOps.boruvkaMsf(
      (1L to 5L).map(i => (i, i + 1, i)).toDF("u", "v", "w"),
      rounds = 5, jumps = 3).head()
    assert(tight.getAs[Boolean]("fully_contracted"),
      "exact-budget settledness must be decided on the FINAL p")
    assert(tight.getAs[Long]("n_tree_edges") == 5L)
  }

  test("rendezvous census: removal moves exactly the removed shard's docs") {
    import spark.implicits._
    val ids = (1L to 200L).toDF("doc_id")
    val rows = ScaleOps.rendezvousCensus(ids, nShards = 8, removed = 3L)
      .collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getAs[Boolean]("minimal_disruption")))
    assert(rows.map(_.getAs[Long]("n_before")).sum == 200L)
    assert(rows.map(_.getAs[Long]("n_after")).sum == 200L)
    val removedRow = rows.find(_.getAs[Long]("shard") == 3L).get
    assert(removedRow.getAs[Long]("n_after") == 0L)
    assert(rows.head.getAs[Long]("total_moved")
      == removedRow.getAs[Long]("n_before"))
    // stay-put property: every surviving shard keeps all its docs and
    // only GAINS refugees — n_after = n_before + n_gained
    rows.filter(_.getAs[Long]("shard") != 3L).foreach { r =>
      assert(r.getAs[Long]("n_after")
        == r.getAs[Long]("n_before") + r.getAs[Long]("n_gained"),
        r.toString)
    }
  }

  test("feistel key: bijective on a full 16-bit domain, stable, in range") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // exhaustive injectivity over 0..65535 (l half = 0 throughout:
    // the worst case for half-mixing) plus a shifted slab that
    // exercises the high half
    val dom = spark.range(0L, 65536L).toDF("doc_id")
      .union(spark.range(1000000L, 1065536L).toDF("doc_id"))
    val keyed = dom.withColumn("skey",
      ScaleOps.feistelKey(col("doc_id")))
    val cen = keyed.agg(count(lit(1)).as("n"),
      countDistinct(col("skey")).as("k"),
      min("skey").as("mn"), max("skey").as("mx")).head()
    assert(cen.getLong(0) == 131072L && cen.getLong(1) == 131072L)
    assert(cen.getLong(2) >= 0L && cen.getLong(3) < (1L << 32))
    // pinned constants: a changed round key or shift silently
    // reshuffles training order — fail loudly instead
    val probe = Seq(0L, 1L, 65535L, 65536L, 123456789L)
    val got = dom.sparkSession.range(1).select(
      probe.map(i => ScaleOps.feistelKey(lit(i))): _*).head()
    val expected = probe.map(feistelRef)
    probe.indices.foreach(i =>
      assert(got.getLong(i) == expected(i), s"id=${probe(i)}"))
  }

  test("q236 zonemap forecast: sorted layout prunes, interleaved " +
      "arrival layout cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 40 rows, v = doc_id % 4 (fully interleaved), shards of 10:
    // arrival shards all span [0,3]; the sorted layout gives each
    // value its own shard — the forecast must show 0 vs 3 skips
    val rows = spark.range(40).select(col("id").as("doc_id"),
      (col("id") % 4).as("v"))
    val got = ScaleOps.zonemapForecast(rows, shardSize = 10L,
        preds = Seq((0L, 0L), (1L, 2L), (5L, 9L))).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[Long]("lo")) ->
        (r.getAs[Long]("n_shards"), r.getAs[Long]("n_skipped"),
          r.getAs[Long]("n_match"), r.getAs[Double]("selectivity")))
      .toMap
    assert(got(("arrival", 0L)) == ((4L, 0L, 10L, 0.25)))
    assert(got(("arrival", 1L)) == ((4L, 0L, 20L, 0.5)))
    assert(got(("arrival", 5L)) == ((4L, 4L, 0L, 0.0)))
    assert(got(("sorted", 0L)) == ((4L, 3L, 10L, 0.25)))
    assert(got(("sorted", 1L)) == ((4L, 2L, 20L, 0.5)))
    assert(got(("sorted", 5L)) == ((4L, 4L, 0L, 0.0)))
  }

  test("q231 band join: blocked pairs == brute-force inequality join") {
    import org.apache.spark.sql.functions._
    // the bucket-blocked plan must find EXACTLY the pairs the naive
    // per-customer cross join finds — including pairs whose buckets
    // differ by 1 in either direction
    val got = ScaleOps.queries("q231_band_join")(spark, sfDir)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_customers")))
      .toMap
    val o = Tables.load(spark, sfDir, "orders").select(
        col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        datediff(to_date(col("o_orderdate")),
          lit("1992-01-01").cast("date")).as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val brute = (for {
      a <- o; b <- o
      if a._1 == b._1 && a._2 < b._2 && math.abs(a._3 - b._3) <= 7
    } yield (math.abs(a._3 - b._3), a._1))
    val expected = brute.groupBy(_._1).map { case (g, xs) =>
      g -> (xs.size.toLong, xs.map(_._2).distinct.size.toLong) }
    assert(got == expected)
    assert(got.nonEmpty, "fixture must produce at least one band pair")
  }

  test("q257 landmark BFS: exact distances on a path graph; " +
      "multi-source equals per-seed single-source") {
    import spark.implicits._
    // path 0-1-2-...-9 (undirected)
    val we = (0L until 9L).map(i => (i, i + 1))
    val edges = (we ++ we.map(_.swap)).toDF("src", "dst")
    def seedDf(vs: Seq[Long]) =
      vs.map(v => (v, v, 0L)).toDF("v", "seed", "dist")
    val (_, multi) = ScaleOps.landmarkBfsRounds(edges,
      seedDf(Seq(0L, 9L)), rounds = 9)
    val got = multi.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      r.getLong(2)).toMap
    // closed form: dist(v, 0) = v, dist(v, 9) = 9 - v
    for (v <- 0L to 9L) {
      assert(got((v, 0L)) == v, s"seed 0, node $v")
      assert(got((v, 9L)) == 9 - v, s"seed 9, node $v")
    }
    // the shared fixpoint must equal each seed's own single-source run
    for (s0 <- Seq(0L, 9L)) {
      val (_, single) = ScaleOps.landmarkBfsRounds(edges,
        seedDf(Seq(s0)), rounds = 9)
      val sm = single.collect().map(r => r.getLong(0) -> r.getLong(2))
        .toMap
      assert(sm == got.collect { case ((v, s), d) if s == s0 => v -> d })
    }
    // horizon cuts reach: 3 rounds from seed 0 reaches nodes 0..3 only
    val (_, cut) = ScaleOps.landmarkBfsRounds(edges,
      seedDf(Seq(0L)), rounds = 3)
    assert(cut.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
  }

  test("q271 consistent hash: movement flows ONLY into the new node") {
    val rows = ScaleOps.queries("q271_consistent_hash")(spark, sfDir)
      .collect()
    assert(rows.length == 21)
    val total = rows.map(_.getAs[Long]("n_a")).sum
    assert(total == rows.map(_.getAs[Long]("n_b")).sum)
    assert(total > 0)
    rows.foreach { r =>
      val node = r.getAs[Int]("node")
      if (node < 20) {
        // adding a node only ADDS ring points, so no key moves
        // BETWEEN old nodes — n_b can only shrink, never gain
        assert(r.getAs[Long]("moved_in") == 0L,
          s"node $node gained keys on scale-out")
        assert(r.getAs[Long]("n_b") <= r.getAs[Long]("n_a"))
      } else {
        assert(r.getAs[Long]("n_a") == 0L)
        assert(r.getAs[Long]("moved_in") == r.getAs[Long]("n_b"))
      }
    }
    // the whole point: movement ~ 1/21, nowhere near rehash's 20/21
    val moved = rows.map(_.getAs[Long]("moved_in")).sum.toDouble / total
    assert(moved < 0.25, s"moved fraction $moved — ring is broken")
  }

  /** Driver-side reference Feistel — same rounds in plain Scala. */
  private def feistelRef(id: Long): Long = {
    val ks = Seq(40503L, 11665L, 30841L, 22621L)
    var l = id >> 16; var r = id & 65535L
    ks.foreach { k =>
      val f = (((r + k) * 2654435761L) % 4294967296L) >> 16
      val nl = r; val nr = l ^ f; l = nl; r = nr
    }
    l * 65536L + r
  }
}
