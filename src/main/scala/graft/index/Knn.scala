package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DistanceMetric

import graft.functions.VectorFunctions._

/** Brute-force KNN — the reference's "naive KNN" plan
  * (vector.02-naive-knn.slt): ORDER BY dist(col, query) LIMIT k.
  * In Spark this is TakeOrderedAndProject: a per-partition bounded heap
  * + single merge, no full sort and no shuffle of the data — the shape
  * that survives 100TB (scan stays columnar, distance is codegen'd).
  */
object Knn {
  def distCol(vec: Column, query: Seq[Double],
      metric: DistanceMetric.Value): Column =
    metricCol(vec, vecLit(query), metric)

  def metricCol(a: Column, b: Column,
      metric: DistanceMetric.Value): Column = metric match {
    case DistanceMetric.L2           => l2Dist(a, b)
    case DistanceMetric.InnerProduct => innerProduct(a, b)
    case DistanceMetric.Cosine       => cosineSimilarity(a, b)
  }

  /** Distance-ascending top-k (reference ScanVectorKey contract:
    * vector_index.h:11-32). `tieBreak` keeps the output deterministic. */
  def bruteForce(df: DataFrame, vecCol: String, query: Seq[Double], k: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2,
      tieBreak: Option[String] = None): DataFrame = {
    val withDist = df.withColumn("dist", distCol(col(vecCol), query, metric))
    val ordered = tieBreak match {
      case Some(c) => withDist.orderBy(col("dist").asc, col(c).asc)
      case None    => withDist.orderBy(col("dist").asc)
    }
    ordered.limit(k)
  }

  /** Exact L2 re-rank of a (q_id, __cand_id) candidate frame: join the
    * true vectors back (candidates only — the shuffle is bounded by
    * the shortlist, never |data|), broadcast the query vectors, window
    * top-k per query. Shared by the PQ and IVF-PQ batch joins so there
    * is ONE copy of the re-rank. Output: (q_id, d_id, dist, rk). */
  private[index] def exactRerank(cand: DataFrame,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      data: DataFrame, dIdCol: String, dVecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dv = data.select(col(dIdCol).cast("long").as("d_id"),
      col(dVecCol).cast("array<double>").as("__dv"))
    val qdf = queries.select(col(qIdCol).cast("long").as("__qid"),
      col(qVecCol).cast("array<double>").as("__qv"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("dist").asc, col("d_id").asc)
    // broadcast the CANDIDATE list (bounded at partitions × shortlist
    // × |queries| ids — never vectors): without the hint the stats-less
    // cand frame plans a SortMergeJoin whose map stage shuffle-writes
    // the ENTIRE data table of vectors, the exact cost PQ exists to cut
    broadcast(cand).join(dv, col("__cand_id") === col("d_id"))
      .join(broadcast(qdf), col("q_id") === col("__qid"))
      .withColumn("dist", l2Dist(col("__dv"), col("__qv")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("q_id"), col("d_id"), col("dist"), col("__rk").as("rk"))
  }

  /** Batch KNN JOIN — top-k data neighbors for EVERY query row, the
    * Spark-native form of vector serving (one job, not Q sequential
    * scans). Exact: broadcast the query set (queries are the small
    * side by construction — integral ids required), then a bounded
    * max-heap of size k PER QUERY inside each data partition — the
    * TakeOrderedAndProject trick, per query. Each partition emits at
    * most k rows per query, so the per-query merge window shuffles
    * O(partitions × k) rows per query instead of the FULL |data| —
    * the previous all-pairs window put every query's entire candidate
    * list (the whole data table) on one reducer, which dies at scale.
    * The data side stays partition-parallel, scanned ONCE.
    *
    * Output: (q_id, d_id, dist, rk) — k rows per query,
    * distance-ascending, ties broken by ascending d_id; join back on
    * the ids for payload columns. For the index-accelerated variant
    * see IvfFlatModel.knnJoin. */
  def join(queries: DataFrame, qVecCol: String, qIdCol: String,
      data: DataFrame, dVecCol: String, dIdCol: String, k: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    // ids are carried as long through the per-partition heaps — fail
    // fast with a clear message rather than an opaque ANSI cast error
    // (or a silent schema change) on non-integral id columns
    def requireIntegral(df: DataFrame, c: String, side: String): Unit = {
      import org.apache.spark.sql.types._
      val ok = df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"Knn.join: $side id column '$c' must be integral, " +
        s"got ${df.schema(c).dataType}")
    }
    requireIntegral(queries, qIdCol, "query")
    requireIntegral(data, dIdCol, "data")
    val spark = data.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graft.NearestCentroid
    val qRows = queries.select(col(qIdCol).cast("long").as("q_id"),
        col(qVecCol).cast("array<double>").as("__qv"))
      .filter(col("__qv").isNotNull) // null vectors are unindexable
      .as[(Long, Array[Double])].collect()
    val qB = spark.sparkContext.broadcast(qRows)
    val metricId = metric.id
    val localTopK = data.select(col(dIdCol).cast("long").as("d_id"),
        col(dVecCol).cast("array<double>").as("__dv"))
      .filter(col("__dv").isNotNull)
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val qs = qB.value
        // worst (largest (dist, id)) on top -> O(log k) eviction
        val heaps = Array.fill(qs.length)(
          collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.Tuple2[Double, Long]))
        it.foreach { case (did, dv) =>
          var i = 0
          while (i < qs.length) {
            val dist = NearestCentroid.distance(dv, qs(i)._2, metricId)
            val h = heaps(i)
            if (h.size < k) h.enqueue((dist, did))
            else if (Ordering.Tuple2[Double, Long].lt((dist, did), h.head)) {
              h.dequeue(); h.enqueue((dist, did))
            }
            i += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
          // NearestCentroid's L2 is the squared form (rank-equivalent,
          // cheaper); emitted dist must match l2_dist (WITH sqrt)
          h.iterator.map { case (dist, did) =>
            (qs(i)._1, did, if (metricId == 0) math.sqrt(dist) else dist) } }
      }.toDF("q_id", "d_id", "dist")
    val w = Window.partitionBy("q_id").orderBy(col("dist").asc,
      col("d_id").asc)
    localTopK
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("q_id"), col("d_id"), col("dist"), col("__rk").as("rk"))
  }
}
