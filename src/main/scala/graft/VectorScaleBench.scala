package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DistanceMetric

import graft.index.{Hnsw, IvfFlat, IvfPq, Knn, Pq}

/** The ANN benchmark at the scale BASELINE.md promises (10k–1M rows,
  * recall@k vs brute force as the quality metric) — the one 100 TB
  * claim plan shapes alone can't carry. The driver's embeddings table
  * tops out at 2,000 rows, so the corpus here is generated IN-HARNESS:
  * deterministic (splitmix64 streams off seed 42, pure function of the
  * row id — identical across partitionings, runs, and hosts), clustered
  * (1,024 well-separated centers + per-row noise, the regime production
  * embedding corpora actually live in), generated DISTRIBUTED (never
  * collected; 1M × dim-128 never touches the driver).
  *
  * Per size point it measures, with the library's own batch-serving
  * paths (the same code the q26/q27/q55/q67/q69/q75/q78 gates pin for
  * correctness at small scale):
  *   - brute_sec: exact batch KNN join ([[Knn.join]]) — the baseline
  *     AND the ground truth for recall;
  *   - per index (IVFFlat, PQ, IVF-PQ, partitioned HNSW): build_sec
  *     (train/encode/graph-insert + materialize), scan_sec (batch KNN
  *     join, best-of-2 so one-time model prep and codegen don't
  *     masquerade as scan cost), recall_at_10 vs the brute top-k.
  *
  * Emitted by Bench as the `vector_scale` section of BENCH_DETAIL.json;
  * the expectation at 1M rows is the ROUTED indexes (IVFFlat, IVF-PQ,
  * partitioned HNSW) beating brute force on scan wall time at recall
  * ≥ 0.9 — indexes that only "would" do less work don't count. Plain
  * PQ is the COMPRESSION tier, not the latency tier: with no routing
  * it still scores every (row, query) — 16 byte-lookups instead of 128
  * multiplies, 16 B/vector instead of 1 KB — so its batch scan tracks
  * brute-shaped compute while cutting the working set 64×; the
  * latency win comes from composing it with routing (IVF-PQ). The
  * shortlist is 48/partition: the clustered corpus packs many
  * near-identical ADC scores, and 24 measurably drops recall@10 to
  * ~0.82 (measured) — tune DOWN only with recall in view.
  */
object VectorScaleBench {

  val Dim = 128
  val Centers = 1024
  val K = 10
  val NQueries = 256

  // --- deterministic generator (splitmix64 — public-domain PRNG mix) --
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  /** Uniform in [-1, 1), a pure function of the stream key. The
    * 53-bit mantissa draw divides by 2^53 (the standard splitmix
    * double conversion) — an earlier 2^52 divisor silently doubled
    * the range to [-1, 3), which the hard-corpus zero-mean spec
    * caught (VectorScaleBenchSpec); the clustered corpus was
    * internally consistent either way, but the documented geometry
    * (inter-center L2 ≈ sqrt(2·dim/3)) only holds with the correct
    * divisor. */
  private def unit(key: Long): Double =
    (mix(key) >>> 11) * (1.0 / (1L << 53)) * 2.0 - 1.0

  /** Row `id`'s vector: its center (id mod Centers) plus ±0.1 noise —
    * inter-center L2 ≈ sqrt(2·dim/3) ≈ 9.2 at dim 128, intra-cluster
    * spread ≈ 0.65, so true neighbors are intra-cluster (the property
    * that makes recall a meaningful target for IVF-style pruning). */
  private def genVec(id: Long, dim: Int): Array[Double] = {
    val c = id % Centers
    Array.tabulate(dim) { j =>
      unit(c * 0x100000001B3L + j) + 0.1 * unit(id * 6364136223846793005L + j)
    }
  }

  /** Distributed corpus: (vec_id, embedding), a pure function of the
    * ids — deterministic for ANY partitioning. */
  def corpus(spark: SparkSession, n: Long, dim: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map(id => (id, genVec(id, dim))))
      .toDF("vec_id", "embedding")
  }

  /** The HARD corpus: i.i.d. uniform coordinates, NO cluster
    * structure. In d=128 a uniform cloud concentrates distances — the
    * 10th-nearest neighbor is barely nearer than the median point — so
    * IVF routing is ambiguous (the true neighbors of a query spread
    * over many lists) and a greedy graph walk has no basin to descend
    * into. This is the regime where recall@10 genuinely TRADES against
    * probe/ef effort; the clustered [[corpus]] pins the throughput
    * story, this one pins the recall-vs-time story ([[runHard]]). */
  private def genVecHard(id: Long, dim: Int): Array[Double] =
    Array.tabulate(dim)(j =>
      unit(id * 0x9E3779B97F4A7C15L + j * 0x100000001B3L + 17L))

  def corpusHard(spark: SparkSession, n: Long, dim: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map(id => (id, genVecHard(id, dim))))
      .toDF("vec_id", "embedding")
  }

  /** Query batch: perturbed corpus points (ids spread across the
    * corpus), so every query has genuine near neighbors. `gen` picks
    * the corpus regime (clustered default, [[genVecHard]] for the
    * hard sweep). */
  private def querySet(n: Long, dim: Int, nQ: Int,
      gen: (Long, Int) => Array[Double] = genVec)
      : Seq[(Long, Seq[Double])] = {
    val stride = math.max(1L, n / nQ)
    (0 until nQ).map { i =>
      val base = gen(i * stride, dim)
      val v = Array.tabulate(dim)(j =>
        base(j) + 0.02 * unit(0xABCDEF1234L + i * 8191L + j))
      (i.toLong, v.toSeq)
    }
  }

  private def timeIt[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** (q_id, d_id) pairs of a batch-join result; recall = mean per-query
    * overlap with the brute-force truth. */
  private def pairsOf(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("q_id").cast("long"), col("d_id").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallVs(truth: Map[Long, Set[Long]],
      got: Map[Long, Set[Long]]): Double = {
    val per = truth.toSeq.map { case (q, t) =>
      if (t.isEmpty) 1.0
      else got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  private def bestOf2(f: => DataFrame): (Map[Long, Set[Long]], Double) = {
    val (p1, t1) = timeIt(pairsOf(f))
    val (_, t2) = timeIt(pairsOf(f))
    (p1, math.min(t1, t2))
  }

  private def r3(v: Double): Double = math.rint(v * 1000) / 1000

  final case class IndexPoint(build: Double, scan: Double, recall: Double) {
    def json: String =
      s"""{"build_sec":${r3(build)},"scan_sec":${r3(scan)},""" +
        s""""recall_at_10":${r3(recall)}}"""
  }
  final case class Point(n: Long, genSec: Double, bruteSec: Double,
      idx: Seq[(String, IndexPoint)], first: Option[Point] = None) {
    def json: String =
      s"""{"n":$n,"gen_sec":${r3(genSec)},"brute_sec":${r3(bruteSec)},""" +
        s""""indexes":{${idx.map { case (k, v) => s""""$k":${v.json}""" }
          .mkString(",")}}""" +
        first.map(f => s""","first_run":${f.json}""").getOrElse("") + "}"
  }

  /** Noise guard — the same treatment per-query timings get: each
    * point runs TWICE, the artifact carries per-metric MINIMA (host
    * starvation only inflates; r7's contended refresh is why). Recall
    * is merged with MIN too — the conservative direction for a quality
    * gate. First-run values survive in `first_run` whenever a metric
    * disagrees by >1.3×, keeping inflated readings auditable. */
  private[graft] def merged(a: Point, b: Point): Point = {
    val bIdx = b.idx.toMap
    val mIdx = a.idx.map { case (k, ia) =>
      val ib = bIdx.getOrElse(k, ia)
      k -> IndexPoint(math.min(ia.build, ib.build),
        math.min(ia.scan, ib.scan), math.min(ia.recall, ib.recall))
    }
    val m = Point(a.n, math.min(a.genSec, b.genSec),
      math.min(a.bruteSec, b.bruteSec), mIdx)
    val mMap = mIdx.toMap
    val noisy = ((a.bruteSec, m.bruteSec) +: a.idx.flatMap { case (k, ia) =>
      Seq((ia.build, mMap(k).build), (ia.scan, mMap(k).scan))
    }).exists { case (f, mn) => f > 1.3 * mn && f - mn > 0.5 }
    if (noisy) m.copy(first = Some(a)) else m
  }
  final case class HardSetting(index: String, param: String,
      scan: Double, recall: Double) {
    def json: String =
      s"""{"index":"$index","param":"$param",""" +
        s""""scan_sec":${r3(scan)},"recall_at_10":${r3(recall)}}"""
  }
  /** One BUILD-side operating point: what a 100 TB index build
    * actually tunes (lists for IVF, m/efConstruction for HNSW) —
    * build cost next to the recall a FIXED reference search effort
    * buys on that build. */
  final case class HardBuild(index: String, build: String,
      buildSec: Double, refSearch: String, scan: Double,
      recall: Double) {
    def json: String =
      s"""{"index":"$index","build":"$build",""" +
        s""""build_sec":${r3(buildSec)},"ref_search":"$refSearch",""" +
        s""""scan_sec":${r3(scan)},"recall_at_10":${r3(recall)}}"""
  }
  final case class HardPoint(n: Long, bruteSec: Double,
      settings: Seq[HardSetting],
      builds: Seq[HardBuild] = Seq.empty) {
    def json: String =
      s"""{"corpus":"uniform","n":$n,"brute_sec":${r3(bruteSec)},""" +
        s""""settings":[${settings.map(_.json).mkString(",")}],""" +
        s""""builds":[${builds.map(_.json).mkString(",")}]}"""
  }
  final case class Result(points: Seq[Point],
      hard: Option[HardPoint] = None) {
    def json: String =
      s"""{"dim":$Dim,"k":$K,"n_queries":$NQueries,"centers":$Centers,""" +
        s""""points":[${points.map(_.json).mkString(",")}],""" +
        s""""hard":${hard.map(_.json).getOrElse("null")}}"""
    /** Compact-headline summary: biggest point's brute/best-scan ratio
      * and the minimum recall across every (point, index). */
    def summary: Option[String] = points.lastOption.map { p =>
      val best = p.idx.map(_._2.scan).min
      val recMin = points.flatMap(_.idx.map(_._2.recall)).min
      s"""{"n_max":${p.n},"brute_sec":${r3(p.bruteSec)},""" +
        s""""best_index_scan_sec":${r3(best)},""" +
        s""""speedup_best":${r3(p.bruteSec / math.max(best, 1e-9))},""" +
        s""""recall_min":${r3(recMin)}}"""
    }
  }

  /** One size point: generate, brute (= truth), then each index's
    * build + batch scan + recall. Caches are scoped to the point. */
  def runPoint(spark: SparkSession, n: Long): Point = {
    import spark.implicits._
    val (df, genSec) = timeIt {
      val d = corpus(spark, n, Dim)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      d
    }
    val qs = querySet(n, Dim, NQueries)
    val qDf = qs.toDF("q_id", "qv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    qDf.count()

    // brute force: baseline AND ground truth
    val (truth, bruteSec) =
      bestOf2(Knn.join(qDf, "qv", "q_id", df, "embedding", "vec_id", K))

    // parameters scale with n: lists ~ sqrt(n); the train sample is
    // bounded (driver k-means at 100 TB trains on a sample by design)
    val lists = math.max(64, math.min(1000, math.sqrt(n.toDouble).toInt))
    val probe = 16
    val trainFrac = math.min(1.0, 24576.0 / n)
    val parts = math.max(1, spark.sparkContext.defaultParallelism)

    val results = Seq.newBuilder[(String, IndexPoint)]

    // IVFFlat — k-means routing, probe = pruned candidate scan
    locally {
      val (model, b) = timeIt {
        val m = IvfFlat.build(df, Seq("vec_id"), "embedding", lists, probe,
          DistanceMetric.L2, iterations = 5, sampleFraction = trainFrac)
        m.buckets.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m.buckets.count()
        m
      }
      // inverted-serve shape (bucket -> probing queries, per-partition
      // heaps): at many-queries scale the candidate-pair shuffle of
      // the window-join variant IS the cost — knnJoinHeap deletes it
      val (got, s) = bestOf2(model.knnJoinHeap(qDf, "q_id", "qv", K))
      results += "ivfflat" -> IndexPoint(b, s, recallVs(truth, got))
      model.buckets.unpersist()
    }

    // PQ — 16×1-byte codes, batch ADC + exact re-rank
    locally {
      val (model, b) = timeIt {
        val m = Pq.build(df, "vec_id", "embedding", m = 16, k = 256,
          iterations = 5, sampleFraction = math.min(1.0, 16384.0 / n))
        m.codes.count()
        m
      }
      val (got, s) = bestOf2(model.knnJoin(qDf, "q_id", "qv",
        df, "vec_id", "embedding", K, shortlist = 48))
      results += "pq" -> IndexPoint(b, s, recallVs(truth, got))
      model.unpersist()
    }

    // IVF-PQ — probe prunes WHICH codes are scored, ADC shrinks the
    // scoring, exact re-rank restores true distances
    locally {
      val (model, b) = timeIt(IvfPq.build(df, "vec_id", "embedding",
        lists, m = 16, k = 256, ivfIterations = 5, pqIterations = 5,
        sampleFraction = math.min(1.0, 16384.0 / n)))
      // probe 8 (vs IVFFlat's 16): the ADC pass scores gated rows AND
      // feeds the rerank, so halving the probed fraction halves both —
      // recall holds at 1.0 on this corpus (routing is unambiguous)
      val (got, s) = bestOf2(model.knnJoin(qDf, "q_id", "qv",
        df, "vec_id", "embedding", K, probeLists = 8, shortlist = 48))
      results += "ivfpq" -> IndexPoint(b, s, recallVs(truth, got))
      model.unpersist()
    }

    // partitioned HNSW — per-partition sub-graphs built in parallel,
    // probed in place, merged top-k
    locally {
      val (idx, b) = timeIt {
        val i = Hnsw.buildPartitioned(df, "vec_id", "embedding", m = 8,
          efConstruction = 48, efSearch = 48, numPartitions = parts)
        i.size // forces the build of every sub-graph
        i
      }
      val (got, s) = bestOf2(idx.knnJoin(qDf, "q_id", "qv", K))
      results += "hnsw_partitioned" -> IndexPoint(b, s, recallVs(truth, got))
      idx.unpersist()
    }

    qDf.unpersist()
    df.unpersist()
    Point(n, genSec, bruteSec, results.result())
  }

  /** The recall-vs-effort sweep on the uniform corpus: build each
    * index ONCE, then scan at two probe/ef settings — the cheap one
    * and a 4× harder one. On this corpus the cheap settings visibly
    * drop recall (unlike the 1024-cluster corpus, where routing is
    * unambiguous and nearly every setting reads 1.0), so the recorded
    * pairs pin the actual recall-vs-time tradeoff a tuner would
    * navigate at 100 TB. */
  def runHard(spark: SparkSession, n: Long): HardPoint = {
    import spark.implicits._
    val df = corpusHard(spark, n, Dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    val qDf = querySet(n, Dim, NQueries, genVecHard).toDF("q_id", "qv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    qDf.count()
    val (truth, bruteSec) =
      bestOf2(Knn.join(qDf, "qv", "q_id", df, "embedding", "vec_id", K))
    val lists = math.max(64, math.min(1000, math.sqrt(n.toDouble).toInt))
    val trainFrac = math.min(1.0, 24576.0 / n)
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val out = Seq.newBuilder[HardSetting]
    val builds = Seq.newBuilder[HardBuild]

    // search-side sweep: probe extends until IVF either reaches
    // recall 0.9 on uniform data or visibly saturates near the brute
    // scan (probe=256 of ~√n lists reads over half the corpus — if
    // recall is still short THERE, the negative result is pinned:
    // IVF routing buys nothing on structureless data, see BASELINE.md)
    locally {
      val (model, b) = timeIt {
        val m = IvfFlat.build(df, Seq("vec_id"), "embedding", lists,
          probeLists = 16, DistanceMetric.L2, iterations = 5,
          sampleFraction = trainFrac)
        m.buckets.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m.buckets.count()
        m
      }
      Seq(8, 32, 128, 256).foreach { p =>
        val (got, s) =
          bestOf2(model.copy(probeLists = p).knnJoinHeap(qDf, "q_id", "qv", K))
        val r = recallVs(truth, got)
        out += HardSetting("ivfflat", s"probe=$p", s, r)
        if (p == 128)
          builds += HardBuild("ivfflat", s"lists=$lists", b,
            s"probe=$p", s, r)
      }
      model.buckets.unpersist()
    }

    // build-side sweep: a COARSER routing grid (lists/4) probed at
    // the same scanned FRACTION (probe/4) — same candidate volume,
    // different partition geometry; pins whether uniform-data recall
    // is a routing-resolution problem (it isn't: the fraction, not
    // the grid, decides recall when lists carry no structure)
    locally {
      val coarse = math.max(32, lists / 4)
      val (model, b) = timeIt {
        val m = IvfFlat.build(df, Seq("vec_id"), "embedding", coarse,
          probeLists = 16, DistanceMetric.L2, iterations = 5,
          sampleFraction = trainFrac)
        m.buckets.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m.buckets.count()
        m
      }
      val p = math.max(2, 128 / 4)
      val (got, s) =
        bestOf2(model.copy(probeLists = p).knnJoinHeap(qDf, "q_id", "qv", K))
      builds += HardBuild("ivfflat", s"lists=$coarse", b,
        s"probe=$p", s, recallVs(truth, got))
      model.buckets.unpersist()
    }

    locally {
      val model = IvfPq.build(df, "vec_id", "embedding", lists, m = 16,
        k = 256, ivfIterations = 5, pqIterations = 5,
        sampleFraction = math.min(1.0, 16384.0 / n))
      Seq(8, 32, 128, 256).foreach { p =>
        // at probe 256 the rerank shortlist caps recall before probing
        // does — widen it with the probed fraction
        val sl = if (p >= 256) 96 else 48
        val (got, s) = bestOf2(model.knnJoin(qDf, "q_id", "qv",
          df, "vec_id", "embedding", K, probeLists = p, shortlist = sl))
        out += HardSetting("ivfpq", s"probe=$p", s, recallVs(truth, got))
      }
      model.unpersist()
    }

    // HNSW: the graph index is the family that CAN buy recall on
    // uniform data — denser graphs (m, efConstruction) trade build
    // time for recall at fixed search effort
    Seq((8, 48), (16, 96)).foreach { case (m, efc) =>
      val (idx, b) = timeIt {
        val i = Hnsw.buildPartitioned(df, "vec_id", "embedding", m = m,
          efConstruction = efc, efSearch = 48, numPartitions = parts)
        i.size
        i
      }
      // only (m==8, any ef) and (any m, ef==192) rows are recorded —
      // skip ef values whose result nothing keeps (two full kNN joins
      // of wasted wall-clock otherwise)
      Seq(48, 192).filter(ef => m == 8 || ef == 192).foreach { ef =>
        val (got, s) = bestOf2(idx.knnJoin(qDf, "q_id", "qv", K, ef = ef))
        val r = recallVs(truth, got)
        if (m == 8)
          out += HardSetting("hnsw_partitioned", s"ef=$ef", s, r)
        if (ef == 192)
          builds += HardBuild("hnsw_partitioned", s"m=$m,efC=$efc", b,
            s"ef=$ef", s, r)
      }
      idx.unpersist()
    }

    qDf.unpersist(); df.unpersist()
    HardPoint(n, bruteSec, out.result(), builds.result())
  }

  def run(spark: SparkSession, sizes: Seq[Long],
      hardN: Option[Long] = None,
      budget: BenchBudget = BenchBudget.unlimited,
      seed: Seq[Point] = Seq.empty): Result = {
    import BenchBudget.{gatedPoints, gatedGuard}
    // SINGLE run per point, budget-gated on the smaller twin (r10
    // verdict items 3/4: the universal second run roughly doubled
    // this harness's wall for readings the guards could re-derive).
    // The implied-exponent guard (ScaleGuard) still re-measures a
    // flagged biggest point: brute + every index build/scan — where
    // r9's 61.9s starved brute-KNN first run showed up, and where
    // HNSW build variance (27.4 vs 34.1s across rounds at identical
    // recall) gets its re-measure. The re-measure itself is gated.
    def cost(p: Point): Double =
      p.bruteSec + p.idx.map { case (_, i) => i.build + i.scan }.sum
    // measured single-run quiet-host costs for the default sizes
    // (gen + brute + all four index build/scan), mildly padded —
    // see BenchBudget.gatedPoints on why linear extrapolation would
    // over-predict the 1M point and starve it
    val DefaultEst = Map(10000L -> 6.0, 100000L -> 14.0, 1000000L -> 55.0)
    val pts = gatedPoints(budget, "vector", sizes, firstEst = 15.0,
      fixedEst = DefaultEst, seed = seed)(n => runPoint(spark, n))(_.n, cost)
    Result(gatedGuard(budget, "vector", pts)(_.n, cost)(
      n => runPoint(spark, n), merged),
      hardN.filter(n => budget.fits(s"vector_hard_$n", 30.0))
        .map(runHard(spark, _)))
  }
}
