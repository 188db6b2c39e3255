package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, ScaleOps}

/** The graph twin of [[VectorScaleBench]]/[[TextScaleBench]]: the
  * SEVEN graph operators (triangle counting, connected components,
  * PageRank, label propagation, k-core, link prediction, Borůvka
  * MSF) executed on GENERATED graphs at 100k and 1M nodes — far
  * beyond the driver tables' ~1.5k-node ceiling — with PLANTED
  * ground truth so every number is checked, not just timed:
  *
  *  - ring+chord clusters (1000 nodes each; node i joins i+1 and i+2
  *    mod cluster): exactly ONE triangle per node ({i, i+1, i+2} — no
  *    other triple closes), so the wedge-join count must equal n;
  *    the 4-regular structure also makes the PageRank stationary
  *    distribution UNIFORM, so after 5 rounds max ≈ min is a
  *    correctness check, and rank mass must be conserved exactly in
  *    fixed-point arithmetic.
  *  - hub-spoke clusters (same size): diameter 2, so HashMin
  *    components converge in ~2 rounds and the component count must
  *    equal n/1000 exactly.
  *  - LPA on the ring+chord graph: labels can only travel edges, so
  *    after 3 rounds every surviving label's members sit in ONE
  *    cluster — the locality invariant.
  *  - link prediction on ring+chord: the candidate set is EXACTLY n
  *    diff-3 pairs (cn 2, ra 0.5) + n diff-4 pairs (cn 1, ra 0.25).
  *  - k-core on [[coreTailEdges]]: the 2-core is precisely the 0.9n
  *    ring nodes (count + id-sum membership checksum) reached at peel
  *    depth 6 (chains cascade one node per round), and k=5 dissolves
  *    everything in exactly 3 rounds.
  *  - Borůvka MSF on ring+chord with ring weight 1 / chord weight 2:
  *    the minimum forest is EXACTLY the 999 consecutive ring edges
  *    per cluster — count, weight and the edge-set checksum are
  *    closed-form; the round-1 merge chain spans the whole ring, so
  *    the jumps = 10 pointer-doubling budget is itself under test
  *    (fully_contracted must read true).
  *
  * Everything derives from the node id (pure functions, deterministic
  * under any partitioning); nothing is collected except O(1) check
  * scalars.
  */
object GraphScaleBench {

  val ClusterSize = 1000L

  /** ring+chord: (u, v) with u<v, one row per undirected edge. */
  def ringChordEdges(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].flatMap { v =>
      val base = v / ClusterSize * ClusterSize
      val i = v % ClusterSize
      Seq(base + (i + 1) % ClusterSize, base + (i + 2) % ClusterSize)
        .map(w => (math.min(v, w), math.max(v, w)))
    }.toDF("u", "v")
  }

  /** hub-spoke: every node links its cluster hub (diameter 2). */
  def hubEdges(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].flatMap { v =>
      val base = v / ClusterSize * ClusterSize
      if (v == base) Iterator.empty else Iterator((base, v))
    }.toDF("u", "v")
  }

  /** core+tail: per 1000-node cluster, nodes 0–899 form a 4-regular
    * ring+chord (i joins i+1, i+2 mod 900) and nodes 900–999 hang off
    * it as twenty DEPTH-5 chains (chain j anchors at ring node 45j).
    * The k-core structure is exact by construction:
    *  - k=2: every chain peels ONE node per round from its free end
    *    (5 removing rounds + confirm = depth 6) and the 2-core is
    *    precisely the 0.9n ring nodes;
    *  - k=5: ring degree is 4, so only the degree-5 anchors survive
    *    round 1, starve in round 2, and round 3 confirms empty.
    * One row per undirected edge; every edge emitted by exactly one
    * generating node (ring nodes emit forward, tail nodes emit their
    * predecessor link). */
  def coreTailEdges(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val ring = ClusterSize - 100 // 900 ring nodes per cluster
    spark.range(n).as[Long].flatMap { v =>
      val base = v / ClusterSize * ClusterSize
      val i = v % ClusterSize
      if (i < ring)
        Seq(base + (i + 1) % ring, base + (i + 2) % ring)
          .map(w => (math.min(v, w), math.max(v, w)))
      else {
        val t = i - ring // 0..99: chain j = t/5, position m = t%5
        val prev =
          if (t % 5 == 0) base + (t / 5) * 45 // anchor ring node
          else v - 1
        Iterator((math.min(prev, v), math.max(prev, v)))
      }
    }.toDF("u", "v")
  }

  private def timeIt[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** 5 PageRank rounds (damping 0.85) with fixed-point BIGINT ranks
    * (1e-6 units — exact mass conservation is part of the check). The
    * co-partitioned shape: edges shuffle-join ranks on src each round
    * (the q110 fallback path — at 1M nodes the rank table is past
    * sensible broadcast), one groupBy(dst), eager localCheckpoint. */
  private def pagerank(spark: SparkSession, edges: DataFrame)
      : (Long, Long, Long) = {
    val S = 1000000L
    val bi = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(edges.select(col("v").as("src"), col("u").as("dst")))
      .cache()
    val deg = bi.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    deg.count()
    var ranks = deg.select(col("src").as("id"), lit(S).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to 5) {
      val contrib = bi.join(deg, "src")
        .join(ranks, col("src") === col("id"))
        .select(col("dst"), (col("r") / col("deg")).cast("long").as("c"))
        .groupBy("dst").agg(sum("c").as("in"))
      ranks = ranks.join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (lit((0.15 * S).toLong)
            + floor(coalesce(col("in"), lit(0L)) * 85L / 100L)
              .cast("long")).as("r"))
        .localCheckpoint(true)
    }
    val r = ranks.agg(sum("r"), min("r"), max("r")).head()
    bi.unpersist(); deg.unpersist()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def r3(v: Double): Double = math.rint(v * 1000) / 1000

  final case class Point(n: Long, edges: Long, genSec: Double,
      triSec: Double, triOk: Boolean, ccSec: Double, ccOk: Boolean,
      prSec: Double, prOk: Boolean, lpaSec: Double, lpaOk: Boolean,
      kcSec: Double = 0.0, kcOk: Boolean = true,
      lpdSec: Double = 0.0, lpdOk: Boolean = true,
      mstSec: Double = 0.0, mstOk: Boolean = true,
      pprSec: Double = 0.0, pprOk: Boolean = true,
      first: Option[Point] = None) {
    def json: String =
      s"""{"n":$n,"edges":$edges,"gen_sec":${r3(genSec)},""" +
        s""""tri_sec":${r3(triSec)},"triangles_ok":$triOk,""" +
        s""""cc_sec":${r3(ccSec)},"components_ok":$ccOk,""" +
        s""""pr_sec":${r3(prSec)},"rank_conserved":$prOk,""" +
        s""""lpa_sec":${r3(lpaSec)},"labels_local":$lpaOk,""" +
        s""""kcore_sec":${r3(kcSec)},"kcore_ok":$kcOk,""" +
        s""""linkpred_sec":${r3(lpdSec)},"linkpred_ok":$lpdOk,""" +
        s""""mst_sec":${r3(mstSec)},"mst_ok":$mstOk,""" +
        s""""ppr_sec":${r3(pprSec)},"ppr_ok":$pprOk""" +
        first.map(f => s""","first_run":${f.json}""").getOrElse("") + "}"
    def allOk: Boolean =
      triOk && ccOk && prOk && lpaOk && kcOk && lpdOk && mstOk && pprOk
  }

  /** Noise guard — the same treatment per-query timings get: each
    * point is measured TWICE and the artifact carries the per-metric
    * MINIMUM (this host's documented CPU starvation only ever inflates
    * a reading; r7's contended refresh recorded graph numbers 3–5× a
    * same-code quiet run). Invariant flags are ANDed — a correctness
    * failure in either run must never be masked. When any metric
    * disagrees by >1.3× the first run's values are kept in a
    * `first_run` field, so an inflated reading stays auditable instead
    * of silently vanishing. */
  private[graft] def merged(a: Point, b: Point): Point = {
    val m = Point(a.n, a.edges,
      math.min(a.genSec, b.genSec),
      math.min(a.triSec, b.triSec), a.triOk && b.triOk,
      math.min(a.ccSec, b.ccSec), a.ccOk && b.ccOk,
      math.min(a.prSec, b.prSec), a.prOk && b.prOk,
      math.min(a.lpaSec, b.lpaSec), a.lpaOk && b.lpaOk,
      math.min(a.kcSec, b.kcSec), a.kcOk && b.kcOk,
      math.min(a.lpdSec, b.lpdSec), a.lpdOk && b.lpdOk,
      math.min(a.mstSec, b.mstSec), a.mstOk && b.mstOk,
      math.min(a.pprSec, b.pprSec), a.pprOk && b.pprOk)
    val noisy = Seq(
      (a.triSec, m.triSec), (a.ccSec, m.ccSec),
      (a.prSec, m.prSec), (a.lpaSec, m.lpaSec),
      (a.kcSec, m.kcSec), (a.lpdSec, m.lpdSec),
      (a.mstSec, m.mstSec), (a.pprSec, m.pprSec))
      .exists { case (f, mn) => f > 1.3 * mn && f - mn > 0.5 }
    if (noisy) m.copy(first = Some(a)) else m
  }
  final case class Result(points: Seq[Point]) {
    def json: String =
      s"""{"cluster_size":$ClusterSize,""" +
        s""""points":[${points.map(_.json).mkString(",")}]}"""
    def summary: Option[String] = points.lastOption.map { p =>
      s"""{"n_max":${p.n},"tri_sec":${r3(p.triSec)},""" +
        s""""pr_sec":${r3(p.prSec)},"all_ok":${p.allOk}}"""
    }
  }

  def runPoint(spark: SparkSession, n: Long): Point = {
    val (rc, genSec) = timeIt {
      val e = ringChordEdges(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      e
    }
    // triangles: planted ground truth — exactly one per node
    val ((_, _, nTri, _), triSec) =
      timeIt(ScaleOps.triangleStats(rc))
    val triOk = nTri == n
    // components on the hub graph: exactly n / ClusterSize
    val hub = hubEdges(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hub.count()
    val (nComp, ccSec) = timeIt {
      DedupOps.ccLabels(hub.select(col("u").as("a_id"), col("v").as("b_id")))
        .select("lbl").distinct().count()
    }
    val ccOk = nComp == n / ClusterSize
    hub.unpersist()
    // PageRank: 4-regular graph -> uniform stationary point; exact
    // integer mass conservation (0.15 remainder floors excepted)
    val ((mass, rMin, rMax), prSec) = timeIt(pagerank(spark, rc))
    // symmetry makes every rank identical (slack 2 units for safety);
    // fixed-point floors lose < 5 units/node/round, geometric sum
    // bounds total mass drift well under 30 units/node
    val prOk = rMax - rMin <= 2L && math.abs(mass - n * 1000000L) < n * 30L
    // LPA locality: a label never escapes its cluster
    val (badLabels, lpaSec) = timeIt {
      var labels = rc.select(col("u").as("v")).unionByName(
          rc.select(col("v"))).distinct()
        .select(col("v"), col("v").as("lbl"))
      val bi = rc.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(rc.select(col("v").as("src"), col("u").as("dst")))
      for (_ <- 1 to 3)
        labels = ScaleOps.lpaRound(bi, labels, broadcastLabels = false)
          .localCheckpoint(true)
      labels.select((col("v") / ClusterSize).cast("long").as("c"),
          col("lbl"))
        .groupBy("lbl").agg(countDistinct(col("c")).as("nc"))
        .filter(col("nc") > 1).count()
    }
    val lpaOk = badLabels == 0
    // link prediction on ring+chord: the candidate set is EXACTLY the
    // diff-3 pairs (two degree-4 centers: cn 2, ra 0.5) plus the
    // diff-4 pairs (one center: cn 1, ra 0.25) — n of each
    val (lpdOk, lpdSec) = timeIt {
      val cand = ScaleOps.linkPredict(rc)
        .groupBy("cn", "ra").agg(count(lit(1)).as("k"))
        .collect().map(r => (r.getAs[Long]("cn"),
          r.getAs[Double]("ra")) -> r.getAs[Long]("k")).toMap
      cand == Map((2L, 0.5) -> n, (1L, 0.25) -> n)
    }
    // Borůvka MSF on ring+chord with ring edges weight 1, chords
    // weight 2: the unique-cost spanning forest takes the 999
    // consecutive ring edges per cluster — count, total weight AND
    // the exact edge-set checksum are closed-form. The merge pointer
    // chain runs the whole ring (depth ~1000), so jumps = 10
    // (2^10 ≥ 999) is the honest contraction budget; round 2 must
    // observe convergence (clusters are disjoint).
    val (mstOk, mstSec) = timeIt {
      val we = rc.withColumn("w",
        when(col("v") - col("u") === 1L ||
            col("v") - col("u") === lit(ClusterSize - 1), 1L)
          .otherwise(2L))
      val r = ScaleOps.boruvkaMsf(we, rounds = 3, jumps = 10).head()
      val nc = n / ClusterSize
      // the chosen tree per cluster b: (b+i-1, b+i) for i = 1..998
      // PLUS the wrap edge (b, b+999) — node 999's min key is
      // (1, b, b+999), which sorts BELOW (1, b+998, b+999); hence
      // Σ ku·10⁶+kv = 10⁶·(999b + 497503) + 999b + 499500
      val expCk = (0L until nc).map { c =>
        val b = c * ClusterSize
        BigInt(1000000L) * (999 * b + 497503L) + (999 * b + 499500L)
      }.sum
      r.getAs[Long]("n_components") == nc &&
        r.getAs[Long]("n_tree_edges") == n - nc &&
        r.getAs[Long]("total_weight") == n - nc &&
        BigInt(r.getAs[Long]("edge_checksum")) == expCk &&
        r.getAs[Boolean]("forest_valid") &&
        r.getAs[Boolean]("fully_contracted") &&
        r.getAs[Boolean]("converged")
    }
    val nEdges = rc.count()
    rc.unpersist()
    // k-core on the core+tail graph: exact planted core, membership
    // id-sum, and peel DEPTH (k=2 cascades one chain node per round;
    // k=5 leaves only the degree-5 anchors for one round). Corpus
    // gen + persist sit OUTSIDE the timed block like the other
    // operators' (rc is pre-persisted too) — kcore_sec times the
    // peel, not the generator.
    val ctSym = {
      val ct = coreTailEdges(spark, n)
      val sym = ct.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(ct.select(col("v").as("src"), col("u").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sym.count()
      sym
    }
    val ringSum = spark.range(n)
      .filter(col("id") % ClusterSize < ClusterSize - 100)
      .agg(sum("id")).head().getLong(0)
    val (kcOk, kcSec) = timeIt {
      // two independent peels — overlap the job chains (guide §2.6,
      // the q197 idiom)
      val Seq(c2, c5) = Util.inParallel(spark, Seq(
        () => ScaleOps.kCore(ctSym, 2).head(),
        () => ScaleOps.kCore(ctSym, 5).head()))
      c2.getAs[Long]("n_core") == n * 9 / 10 &&
        c2.getAs[Long]("id_sum") == ringSum &&
        c2.getAs[Int]("rounds") == 6 &&
        c5.getAs[Long]("n_core") == 0L &&
        c5.getAs[Int]("rounds") == 3
    }
    ctSym.unpersist()
    // Personalized PageRank on the hub graph (disjoint 1000-node
    // stars), seeds = the hub of every 100th cluster, co-partitioned
    // path (the 1M-rank table is past sensible broadcast). EXACT
    // planted truth from disconnectedness + symmetry: restart mass
    // can NEVER reach an unseeded cluster (nonzero ranks == 1000 per
    // seed, zero elsewhere), every spoke of a seeded star holds the
    // IDENTICAL rank, and the hub outranks its spokes.
    val hubSym = {
      val h = hubEdges(spark, n)
      val sym = h.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(h.select(col("v").as("src"), col("u").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sym.count()
      sym
    }
    // every 100th cluster's hub seeds; small spec runs shrink the
    // stride so at least one seed exists
    val seedStride = math.min(ClusterSize * 100L, n)
    val seeds = spark.range(n).filter(col("id") % seedStride === 0)
      .select(col("id").as("node"))
    val (pprOk, pprSec) = timeIt {
      val r = ScaleOps.pprFixedPoint(hubSym, seeds, rounds = 5,
        forceCoPartition = Some(true))
      val st = r.select(
          col("node"),
          (col("node") % seedStride < ClusterSize).as("seeded"),
          (col("node") % ClusterSize === 0).as("hub"),
          col("r_fp"))
        .groupBy("seeded")
        .agg(count(lit(1)).as("nodes"),
          sum(when(col("r_fp") > 0, 1L).otherwise(0L)).as("nonzero"),
          countDistinct(when(!col("hub"), col("r_fp"))).as("spoke_vals"),
          min(when(col("hub"), col("r_fp"))).as("hub_min"),
          max(when(!col("hub"), col("r_fp"))).as("spoke_max"))
        .collect().map(x => x.getAs[Boolean]("seeded") -> x).toMap
      val nSeeds = (n + seedStride - 1) / seedStride
      val sOk = st.get(true).exists { x =>
        x.getAs[Long]("nonzero") == nSeeds * ClusterSize &&
          x.getAs[Long]("spoke_vals") == 1L &&
          x.getAs[Long]("hub_min") > x.getAs[Long]("spoke_max")
      }
      val uOk = st.get(false).forall(_.getAs[Long]("nonzero") == 0L)
      sOk && uOk
    }
    hubSym.unpersist()
    Point(n, nEdges, genSec, triSec, triOk, ccSec, ccOk, prSec, prOk,
      lpaSec, lpaOk, kcSec, kcOk, lpdSec, lpdOk, mstSec, mstOk,
      pprSec, pprOk)
  }

  def run(spark: SparkSession, sizes: Seq[Long],
      budget: BenchBudget = BenchBudget.unlimited,
      seed: Seq[Point] = Seq.empty): Result = {
    import BenchBudget.{gatedPoints, gatedGuard}
    // SINGLE run per point, budget-gated on the smaller twin (r10
    // verdict items 3/4). The implied-exponent guard (ScaleGuard)
    // still re-measures a flagged biggest point (sum of op times):
    // sustained contention re-reads low, a genuine cliff reproduces
    // and stands. The re-measure itself is gated.
    def cost(p: Point): Double = p.triSec + p.ccSec + p.prSec +
      p.lpaSec + p.kcSec + p.lpdSec + p.mstSec + p.pprSec
    // measured single-run quiet-host costs (all eight ops + gen) for
    // the default sizes, mildly padded (see BenchBudget.gatedPoints)
    val DefaultEst = Map(100000L -> 32.0, 1000000L -> 90.0)
    val pts = gatedPoints(budget, "graph", sizes, firstEst = 30.0,
      fixedEst = DefaultEst, seed = seed)(n => runPoint(spark, n))(_.n, cost)
    Result(gatedGuard(budget, "graph", pts)(_.n, cost)(
      n => runPoint(spark, n), merged))
  }
}
