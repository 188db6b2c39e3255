package graft.index

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.{DistanceMetric, NearestCentroid}

/** HNSW ANN index.
  *
  * Graph construction is inherently sequential per-insert, so the build
  * runs on the driver over the collected (id, vector) pairs — the same
  * trade the reference makes implicitly by being single-node
  * (`src/storage/index/hnsw_index.cpp:180-185`, BuildIndex = shuffle +
  * insert one-by-one). Hyperparameters follow the reference exactly
  * (`hnsw_index.cpp:51-54`): m_max = m, m_max0 = m², m_l = 1/ln(m);
  * random level = floor(-ln(U) * m_l) (`:207-209`); greedy best-first
  * SearchLayer with a candidate min-heap and a result max-heap bounded
  * by ef (`:86-130`); neighbor selection = simple m-nearest (`:62-83`).
  *
  * "Distance" is ComputeDistance's raw value (L2 with sqrt, raw inner
  * product, raw cosine similarity) minimized — reproducing the
  * reference's ordering for ALL metrics, including the quirky
  * least-similar-first IP/cosine behavior (SURVEY §7.4).
  *
  * Serving: the graph is a small immutable structure; ship it with
  * `broadcast` and probe per-partition for batch KNN-join, or query it
  * on the driver for single lookups. At 100TB the scale path is
  * `Hnsw.buildPartitioned`: HNSW-per-partition sub-graphs persisted
  * distributed (executor memory, never collected), probed in place,
  * merged top-k.
  *
  * Determinism: seeded RNG (default 42) + deterministic insert order
  * (caller sorts) make builds reproducible; recall properties are
  * asserted in HnswSpec rather than exact rows, matching how the
  * reference's own tests only pin `statement ok` for HNSW.
  */
final class HnswIndex(
    val m: Int,
    val efConstruction: Int,
    val efSearch: Int,
    val metric: DistanceMetric.Value,
    seed: Long = 42L) extends Serializable {

  private val mMax = m
  private val mMax0 = m * m
  private val mL = 1.0 / math.log(m.toDouble)
  private val rng = new Random(seed)

  private val vectors = mutable.ArrayBuffer.empty[Array[Double]]
  private val ids = mutable.ArrayBuffer.empty[Long]
  // layers(l) = adjacency for layer l as a DENSE array indexed by
  // vertex (null slot = vertex absent from the layer); layer 0 holds
  // every vertex. Neighbor lists are flat int arrays
  // ([[Hnsw.Nbrs]]: append-with-dup-check, swap-remove) — the
  // degree bound keeps them tiny, so linear scans beat any boxed Set
  // and the whole hot path allocates nothing per visit. The algorithm
  // is byte-for-byte the same greedy construction as before (same
  // reference citations below); only the containers changed — this
  // bulk-build hot path was 12× IVFFlat's build cost at 1M rows when
  // it ran on boxed Sets and tuple PriorityQueues.
  private val layers =
    mutable.ArrayBuffer[mutable.ArrayBuffer[Hnsw.Nbrs]](
      mutable.ArrayBuffer())
  private var entryPoint: Int = -1

  // Epoch-stamped visited marks, reused across searchLayer calls (one
  // int array for the graph's lifetime instead of a hash set per
  // search). Transient: rebuilt lazily after deserialization.
  @transient private var visitedMark: Array[Int] = null
  @transient private var visitedEpoch: Int = 0

  /** Grow `layers(layer)` so slot `v` exists, and make the vertex a
    * member of the layer (empty neighbor list) if it wasn't. */
  private def slot(layer: Int, v: Int): Unit = {
    val adj = layers(layer)
    while (adj.length <= v) adj += null
    if (adj(v) == null) adj(v) = new Hnsw.Nbrs
  }

  /** The neighbor list of `v` in `layer`, or null when the vertex is
    * not a member (dense array ⇒ also null past the end). */
  @inline private def nbrsOf(layer: Int, v: Int): Hnsw.Nbrs = {
    val adj = layers(layer)
    if (v < adj.length) adj(v) else null
  }

  private def dist(a: Array[Double], b: Array[Double]): Double =
    metric match {
      case DistanceMetric.L2 =>
        math.sqrt(NearestCentroid.distance(a, b, 0))
      case _ => NearestCentroid.distance(a, b, metric.id)
    }

  def size: Int = vectors.length

  /** Highest external id ever inserted (-1 when empty) — the insert
    * watermark callers should use; `size` under-counts relative to row
    * ids whenever unindexable (null-vector) rows were skipped. */
  def maxId: Long = if (ids.isEmpty) -1L else _maxId
  private var _maxId: Long = -1L

  /** Tombstoned (soft-deleted) slots. Search still ROUTES THROUGH
    * them — physically unlinking vertices would tear holes in the
    * small-world graph and silently cost recall on untouched ids —
    * but a tombstone can never be RETURNED. This is the production
    * HNSW delete (soft delete + filtered search, compaction
    * deferred to a rebuild); [[scanFull]] widens its beam by the
    * tombstone count so a probe-all scan stays EXACT over the
    * survivors. */
  private val deleted = new java.util.BitSet()
  private var nDeleted = 0

  /** Tombstone every slot whose external id equals `id`; returns
    * whether anything was newly deleted. */
  def delete(id: Long): Boolean = {
    var i = 0
    var hit = false
    while (i < ids.length) {
      if (ids(i) == id && !deleted.get(i)) {
        deleted.set(i); nDeleted += 1; hit = true
      }
      i += 1
    }
    hit
  }

  def deletedCount: Int = nDeleted

  /** Greedy best-first search in one layer (reference SearchLayer,
    * hnsw_index.cpp:86-130): candidates min-heap, results max-heap
    * bounded by ef. Returns up to ef vertices, distance-ascending.
    * Heaps are primitive (double, int) binary heaps ([[Hnsw.DIHeap]] —
    * max-heap = min-heap on the negated distance), visited tracking is
    * the epoch array — zero boxing anywhere in the walk. */
  private def searchLayer(layer: Int, query: Array[Double], ef: Int,
      entries: Array[Int]): Array[Int] = {
    if (visitedMark == null || visitedMark.length < vectors.length)
      visitedMark = new Array[Int](math.max(64, vectors.length * 2))
    visitedEpoch += 1
    val epoch = visitedEpoch
    val cand = new Hnsw.DIHeap   // min-heap on distance
    val result = new Hnsw.DIHeap // max-heap: keys stored negated
    var i = 0
    while (i < entries.length) {
      val e = entries(i)
      if (visitedMark(e) != epoch) {
        visitedMark(e) = epoch
        val d = dist(query, vectors(e))
        cand.push(d, e); result.push(-d, e)
      }
      i += 1
    }
    while (result.size > ef) result.pop()
    var done = false
    while (cand.size > 0 && !done) {
      val d = cand.headKey
      val v = cand.headVal
      cand.pop()
      if (result.size > 0 && d > -result.headKey) done = true
      else {
        val nb = nbrsOf(layer, v)
        if (nb != null) {
          var j = 0
          while (j < nb.n) {
            val t = nb.a(j)
            if (visitedMark(t) != epoch) {
              visitedMark(t) = epoch
              val nd = dist(query, vectors(t))
              if (result.size < ef || nd < -result.headKey) {
                cand.push(nd, t); result.push(-nd, t)
                if (result.size > ef) result.pop()
              }
            }
            j += 1
          }
        }
      }
    }
    // drain the max-heap back-to-front → distance-ascending ids
    val out = new Array[Int](result.size)
    var k = result.size - 1
    while (k >= 0) {
      out(k) = result.headVal; result.pop(); k -= 1
    }
    out
  }

  private def connect(layer: Int, a: Int, b: Int): Unit = {
    slot(layer, a); slot(layer, b)
    layers(layer)(a).add(b)
    layers(layer)(b).add(a)
  }

  /** Degree-bound pruning: over-degree vertices keep only the m
    * nearest of their CURRENT neighbors.
    *
    * INTENTIONAL DEVIATION from the reference's PurgeEdges
    * (hnsw_index.cpp:154-170), which re-selects the m nearest among
    * ALL vertices in the layer (an O(layer) rescan that also re-links
    * to vertices that were never neighbors), and from its descent
    * that inserts path edges into `layers_[level]` rather than the
    * layer being descended (hnsw_index.cpp:240). Both are
    * reference-implementation quirks, not published-HNSW semantics;
    * we follow the paper (prune within the neighbor set). The graphs
    * therefore differ structurally; parity is pinned at the
    * RESULT level — recall bounds in IndexSpec, and exact equality
    * with brute force under probe-all ef (q55/q39 oracles). */
  private def prune(layer: Int, v: Int): Unit = {
    val maxDeg = if (layer == 0) mMax0 else mMax
    val nbrs = nbrsOf(layer, v)
    if (nbrs != null && nbrs.n > maxDeg) {
      val keep = (0 until nbrs.n)
        .map { i => val n = nbrs.a(i); (dist(vectors(v), vectors(n)), n) }
        .sortBy(t => (t._1, t._2)).take(m).map(_._2)
      var i = 0
      while (i < nbrs.n) {
        val old = nbrsOf(layer, nbrs.a(i))
        if (old != null) old.remove(v)
        i += 1
      }
      nbrs.setTo(keep.toArray)
      keep.foreach { n => slot(layer, n); layers(layer)(n).add(v) }
    }
  }

  /** Insert (reference InsertVectorEntry, hnsw_index.cpp:204-279):
    * geometric random level, descend with ef=1 above the target level,
    * connect to up to efConstruction neighbors on target..0, prune. */
  def insert(id: Long, vec: Array[Double]): Unit = {
    val v = vectors.length
    vectors += vec; ids += id
    if (id > _maxId) _maxId = id
    val level = math.floor(-math.log(rng.nextDouble()) * mL).toInt
    if (entryPoint < 0) {
      while (layers.length <= level) layers += mutable.ArrayBuffer()
      (0 to level).foreach(l => slot(l, v))
      entryPoint = v
      return
    }
    val topLevel = layers.length - 1
    var eps: Array[Int] = Array(entryPoint)
    var l = topLevel
    while (l > math.min(level, topLevel)) {
      eps = searchLayer(l, vec, 1, eps); l -= 1
    }
    while (l >= 0) {
      val found = searchLayer(l, vec, efConstruction, eps)
      slot(l, v)
      found.foreach(n => connect(l, v, n))
      prune(l, v)
      found.foreach(n => prune(l, n))
      eps = found
      l -= 1
    }
    if (level > topLevel) {
      while (layers.length <= level) {
        layers += mutable.ArrayBuffer()
        slot(layers.length - 1, v)
      }
      entryPoint = v
    }
  }

  /** KNN scan (reference ScanVectorKey, hnsw_index.cpp:188-201): descend
    * layers with efSearch, then a layer-0 search with max(k, efSearch).
    * `ef` > 0 overrides the build-time efSearch for THIS scan — the
    * recall-vs-time knob a serving layer tunes without rebuilding the
    * graph (VectorScaleBench's hard-corpus sweep uses it). */
  def scan(query: Array[Double], k: Int, ef: Int = -1)
      : Seq[(Long, Double)] =
    scanFull(query, k, ef).map(t => (t._1, t._3))

  /** scan() + the stored vectors (for vector-valued semi-joins).
    *
    * Probe-all mode (ef >= |vectors|): seed the layer-0 search with
    * EVERY vertex instead of the greedy descent. The beam with ef >= n
    * then ranks all n vertices, so the result is exact even if
    * degree-bound pruning ever disconnected the graph — the
    * guarantee q55/q39's brute-force oracles rely on; connectivity
    * alone would be an empirical assumption. */
  def scanFull(query: Array[Double], k: Int, ef: Int = -1)
      : Seq[(Long, Array[Double], Double)] = {
    if (entryPoint < 0) return Seq.empty
    val efUse = if (ef > 0) ef else efSearch
    val probeAll = efUse >= vectors.length
    val eps0: Array[Int] =
      if (probeAll) Array.tabulate(vectors.length)(identity)
      else {
        var eps: Array[Int] = Array(entryPoint)
        var l = layers.length - 1
        while (l > 0) { eps = searchLayer(l, query, efUse, eps); l -= 1 }
        eps
      }
    // beam widened by the tombstone count: with ef >= n (probe-all)
    // every survivor is ranked, so filter-then-take(k) is exact
    searchLayer(0, query, math.max(k + nDeleted, efUse), eps0)
      .iterator.filterNot(v => deleted.get(v))
      .take(k).toSeq
      .map(v => (ids(v), vectors(v), dist(query, vectors(v))))
  }
}

object Hnsw {

  /** Flat-int-array neighbor list: append with a linear dup check,
    * swap-remove — the degree bound (m² at layer 0) keeps `n` tiny, so
    * linear scans over a primitive array are faster than any hash set
    * and allocate nothing. Serializable so sub-graphs survive
    * [[DistributedHnswIndex.save]]/[[Hnsw.loadPartitioned]] and the
    * deep-copy insert path unchanged. */
  private[index] final class Nbrs extends Serializable {
    var a: Array[Int] = new Array[Int](8)
    var n: Int = 0
    def add(x: Int): Unit = {
      var i = 0
      while (i < n) { if (a(i) == x) return; i += 1 }
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = x; n += 1
    }
    def remove(x: Int): Unit = {
      var i = 0
      while (i < n) {
        if (a(i) == x) { n -= 1; a(i) = a(n); return }
        i += 1
      }
    }
    def setTo(xs: Array[Int]): Unit = {
      if (xs.length > a.length)
        a = java.util.Arrays.copyOf(xs, xs.length)
      else System.arraycopy(xs, 0, a, 0, xs.length)
      n = xs.length
    }
  }

  /** Primitive (double key, int value) binary min-heap — push a
    * negated key for max-heap behavior. Method-local in searchLayer;
    * never serialized. */
  private[index] final class DIHeap {
    private var ks = new Array[Double](64)
    private var vs = new Array[Int](64)
    var size: Int = 0
    def headKey: Double = ks(0)
    def headVal: Int = vs(0)
    def push(k: Double, v: Int): Unit = {
      if (size == ks.length) {
        ks = java.util.Arrays.copyOf(ks, size * 2)
        vs = java.util.Arrays.copyOf(vs, size * 2)
      }
      var i = size; size += 1
      while (i > 0 && k < ks((i - 1) >> 1)) {
        val p = (i - 1) >> 1
        ks(i) = ks(p); vs(i) = vs(p); i = p
      }
      ks(i) = k; vs(i) = v
    }
    def pop(): Unit = {
      size -= 1
      val k = ks(size); val v = vs(size)
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        if (l >= size) done = true
        else {
          val c = if (l + 1 < size && ks(l + 1) < ks(l)) l + 1 else l
          if (ks(c) < k) { ks(i) = ks(c); vs(i) = vs(c); i = c }
          else done = true
        }
      }
      ks(i) = k; vs(i) = v
    }
  }

  /** Max corpus (rows × dim doubles) collected for the single
    * driver-built graph: 2^23 doubles = 64 MB — the same bound
    * [[IvfFlat.driverTrainLimit]] applies to its driver-local k-means.
    * Above it [[build]] refuses loudly (the collect would OOM the
    * driver long before the graph finishes) and [[buildAuto]] routes
    * to [[buildPartitioned]], the scale path. */
  val driverBuildLimit: Long = 1L << 23

  /** One cheap agg job: (row count, max vector length). Far cheaper
    * than the collect it guards. */
  private def corpusCells(df: DataFrame, vecCol: String): Long = {
    import org.apache.spark.sql.functions._
    val r = df.filter(col(vecCol).isNotNull)
      .agg(count(lit(1)), max(size(col(vecCol).cast("array<double>"))))
      .head()
    if (r.isNullAt(1)) 0L else r.getLong(0) * r.getInt(1)
  }

  /** Collect (id, vec) to the driver and build sequentially. Sorted by
    * id for reproducibility (the reference shuffles with an unseeded
    * RNG — we pin determinism instead; recall is equivalent).
    * BOUNDED at [[driverBuildLimit]] cells: an over-threshold corpus
    * must go through [[buildPartitioned]] (or [[buildAuto]], which
    * routes by size) — failing fast here beats an OOM mid-collect. */
  def build(df: DataFrame, idCol: String, vecCol: String,
      m: Int, efConstruction: Int, efSearch: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2,
      seed: Long = 42L,
      driverLimit: Long = driverBuildLimit): HnswIndex = {
    import org.apache.spark.sql.functions._
    val cells = corpusCells(df, vecCol)
    require(cells <= driverLimit,
      s"Hnsw.build: corpus is $cells doubles (> $driverLimit = 64 MB " +
        "driver bound) — use Hnsw.buildPartitioned (or buildAuto) for " +
        "over-threshold corpora")
    val rows = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(vecCol).isNotNull) // null vectors are unindexable
      .orderBy(col(idCol)).collect()
    val idx = new HnswIndex(m, efConstruction, efSearch, metric, seed)
    rows.foreach(r => idx.insert(r.getLong(0), r.getSeq[Double](1).toArray))
    idx
  }

  /** Uniform serving surface over the two build shapes, so size-routed
    * callers ([[buildAuto]]) don't fork on the concrete type. */
  sealed trait Serving {
    def scan(query: Array[Double], k: Int): Seq[(Long, Double)]
    def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
        k: Int): DataFrame
    def isPartitioned: Boolean
  }
  final class DriverServing(val idx: HnswIndex) extends Serving {
    def scan(query: Array[Double], k: Int): Seq[(Long, Double)] =
      idx.scan(query, k)
    def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
        k: Int): DataFrame = Hnsw.knnJoin(queries, qIdCol, qVecCol, idx, k)
    def isPartitioned = false
  }
  final class PartitionedServing(val idx: DistributedHnswIndex)
      extends Serving {
    def scan(query: Array[Double], k: Int): Seq[(Long, Double)] =
      idx.scan(query, k)
    def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
        k: Int): DataFrame = idx.knnJoin(queries, qIdCol, qVecCol, k)
    def isPartitioned = true
  }

  /** Size-routed build: the driver graph when the corpus fits
    * [[driverBuildLimit]], per-partition sub-graphs
    * ([[buildPartitioned]]) when it doesn't — the caller never has to
    * know which side of the bound the table is on. */
  def buildAuto(df: DataFrame, idCol: String, vecCol: String,
      m: Int, efConstruction: Int, efSearch: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2,
      numPartitions: Int = 0, seed: Long = 42L,
      driverLimit: Long = driverBuildLimit): Serving =
    if (corpusCells(df, vecCol) <= driverLimit)
      new DriverServing(build(df, idCol, vecCol, m, efConstruction,
        efSearch, metric, seed, driverLimit))
    else
      new PartitionedServing(buildPartitioned(df, idCol, vecCol, m,
        efConstruction, efSearch, metric, numPartitions, seed))

  /** Serve a KNN scan as a DataFrame (id, dist), distance-ascending. */
  def scanAsDf(spark: SparkSession, idx: HnswIndex,
      query: Seq[Double], k: Int): DataFrame = {
    import spark.implicits._
    idx.scan(query.toArray, k).toDF("id", "dist")
  }

  /** Batch KNN JOIN served from a BROADCAST graph: ship the immutable
    * index to executors once, probe it per query row inside
    * mapPartitions — queries stay partition-parallel, the graph walk
    * is local, no shuffle at all. The serving shape for "many queries
    * against one index" (the reference can only scan one query at a
    * time through its executor tree). */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
      idx: HnswIndex, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(idx)
    queries
      .select(col(qIdCol).cast("long"), col(qVecCol).cast("array<double>"))
      .filter(col(qVecCol).isNotNull)
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val index = bc.value
        it.flatMap { case (qId, qv) =>
          index.scan(qv.toArray, k).zipWithIndex.map {
            case ((dId, dist), i) => (qId, dId, dist, i + 1)
          }
        }
      }
      .toDF("q_id", "d_id", "dist", "rk")
  }

  /** The 100TB-scale HNSW: one independent sub-graph per partition,
    * built in PARALLEL inside mapPartitions (sequential insert is the
    * single-node bottleneck — partitioning is what removes it), served
    * by probing every sub-graph WHERE IT LIVES and merging only the
    * per-partition top-k candidates. Search cost is P small graph
    * walks instead of one; recall is >= the monolithic graph's because
    * each sub-graph is searched independently (no cross-partition
    * edges to mislead the greedy descent).
    *
    * The sub-indexes stay distributed: an RDD of graph objects,
    * persisted deserialized in executor memory (spilling to disk) —
    * an RDD on purpose: a graph index is genuine per-partition
    * imperative state, and the deserialized-object cache means zero
    * per-query rehydration, which a Dataset[Array[Byte]] of
    * serialized blobs could not offer. The driver only ever receives
    * merged top-k rows, never a graph. */
  final class DistributedHnswIndex(
      @transient val parts: org.apache.spark.rdd.RDD[HnswIndex]) {

    /** One job per lookup: probe each cached sub-graph locally, emit
      * its k candidates, takeOrdered merges the P*k survivors. */
    def scan(query: Array[Double], k: Int): Seq[(Long, Double)] = {
      val q = query
      parts.flatMap(_.scan(q, k))
        .takeOrdered(k)(Ordering.by { case (id, d) => (d, id) }).toSeq
    }

    /** Batch KNN join: broadcast the query batch once, probe every
      * sub-graph per query where it lives, then one bounded window
      * merge over P*k rows per query. Queries are the small side by
      * construction (the big side is the indexed corpus). `ef` > 0
      * overrides each sub-graph's build-time efSearch per scan. */
    def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
        k: Int, ef: Int = -1): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val spark = queries.sparkSession
      import spark.implicits._
      val qs = queries
        .select(col(qIdCol).cast("long"), col(qVecCol).cast("array<double>"))
        .filter(col(qVecCol).isNotNull)
        .as[(Long, Array[Double])].collect()
      val bc = parts.sparkContext.broadcast(qs)
      val local = parts.mapPartitions { it =>
        it.flatMap { idx =>
          bc.value.iterator.flatMap { case (qid, qv) =>
            idx.scan(qv, k, ef).map { case (did, d) => (qid, did, d) }
          }
        }
      }
      val w = Window.partitionBy("q_id")
        .orderBy(col("dist").asc, col("d_id").asc)
      spark.createDataFrame(local).toDF("q_id", "d_id", "dist")
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .select(col("q_id"), col("d_id"), col("dist"), col("__rk").as("rk"))
    }

    /** Incremental insert (the InsertVectorEntry contract every
      * reference index declares, vector_index.h:11-32): route each new
      * row to a partition by id hash — correctness does not depend on
      * WHICH sub-graph receives a row, since scans probe every
      * sub-graph; routing only shapes balance — and extend that
      * partition's sub-graph. Functional: each touched sub-graph is
      * deep-copied (serialization round-trip) before mutation, the new
      * RDD is materialized before returning, and the original index
      * remains valid — never mutate objects living in another RDD's
      * cache. Partitions that were empty at build time grow a fresh
      * sub-graph with the same hyperparameters. */
    def insert(rows: DataFrame, idCol: String, vecCol: String)
        : DistributedHnswIndex = {
      import org.apache.spark.sql.functions._
      // ship ONLY the 4 hyperparameters to the driver — parts.first()
      // would deserialize partition 0's entire sub-graph (vectors +
      // links) for 4 scalars
      val (m0, efc0, efs0, met0) = parts
        .map(p => (p.m, p.efConstruction, p.efSearch, p.metric)).first()
      val routed = rows
        .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
        .filter(col(vecCol).isNotNull)
        .repartition(parts.partitions.length, col(idCol))
      val newParts = parts.zipPartitions(routed.rdd) { (idxIt, rowIt) =>
        val fresh = rowIt
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .toSeq.sortBy(_._1) // deterministic insert order
        if (fresh.isEmpty) idxIt
        else {
          val idx =
            if (idxIt.hasNext) Hnsw.deepCopy(idxIt.next())
            else new HnswIndex(m0, efc0, efs0, met0,
              42L + org.apache.spark.TaskContext.getPartitionId())
          fresh.foreach { case (id, v) => idx.insert(id, v) }
          Iterator.single(idx) ++ idxIt
        }
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      newParts.count() // materialize the copies while `parts` is live
      new DistributedHnswIndex(newParts)
    }

    def numParts: Int = parts.partitions.length
    def size: Long = parts.map(_.size.toLong).sum().toLong
    def unpersist(): Unit = parts.unpersist()

    /** Persist the sub-graphs to storage, one serialized object per
      * partition — the restart-surviving layout; reopen with
      * [[Hnsw.loadPartitioned]]. */
    def save(path: String): Unit = parts.saveAsObjectFile(path)
  }

  /** Deep copy via a serialization round-trip — the safe way to derive
    * a mutated sub-graph from an object held in an RDD cache. */
  private[index] def deepCopy(idx: HnswIndex): HnswIndex = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(idx); oos.close()
    val ois = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    ois.readObject().asInstanceOf[HnswIndex]
  }

  /** Reopen a [[DistributedHnswIndex.save]]d index: sub-graphs are read
    * and cached where they land, never on the driver. */
  def loadPartitioned(spark: SparkSession, path: String)
      : DistributedHnswIndex =
    new DistributedHnswIndex(
      spark.sparkContext.objectFile[HnswIndex](path)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def buildPartitioned(df: DataFrame, idCol: String, vecCol: String,
      m: Int, efConstruction: Int, efSearch: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2,
      numPartitions: Int = 0, seed: Long = 42L): DistributedHnswIndex = {
    import org.apache.spark.sql.functions._
    val base = df
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .filter(col(vecCol).isNotNull)
    val parts =
      (if (numPartitions > 0) base.repartition(numPartitions, col(idCol))
       else base)
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        val idx = new HnswIndex(m, efConstruction, efSearch, metric,
          seed + pid)
        // sort within partition for reproducible builds
        it.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .toSeq.sortBy(_._1)
          .foreach { case (id, v) => idx.insert(id, v) }
        // ALWAYS emit the (possibly empty) sub-graph: it carries the
        // hyperparameters, so an index built over an empty table (the
        // create-index-then-insert flow) still has a params template
        // for insert() to extend — and scans over empty graphs are free
        Iterator.single(idx)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    new DistributedHnswIndex(parts)
  }
}
