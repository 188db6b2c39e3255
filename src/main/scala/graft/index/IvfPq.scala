package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DistanceMetric, NearestCentroid}

/** IVF-PQ — the standard billion-scale ANN layout: IVFFlat's k-means
  * routing prunes WHICH partitions are read (probe_lists of lists),
  * product quantization shrinks WHAT is read (M bytes per vector for
  * the candidate scan), and an exact re-rank over the shortlist
  * restores true distances. Both halves are the components already
  * built here ([[IvfFlat]], [[Pq]]); this composes them: the PQ codes
  * carry the IVF bucket id, so a probe is a codegen'd filter — or
  * PARTITION PRUNING once the code table is [[IvfPqModel.save]]d
  * bucketed (IndexSpec asserts PartitionFilters on a loaded scan).
  *
  * probe_lists = lists AND shortlist >= n degenerates to exact brute
  * force — the configuration the q69 oracle pins (through a save/load
  * round-trip); IndexSpec gates the pruned+compressed configuration's
  * recall. L2 only: the ADC sum-of-sub-distances decomposition is an
  * L2 identity. */
final case class IvfPqModel(
    centroids: Array[Array[Double]],
    pq: PqModel,
    codes: DataFrame) { // (id, code, __bucket)

  /** computed once per model — a distinct job per lookup otherwise
    * (same reasoning as IvfFlatModel.nonEmptyCache) */
  @transient private lazy val nonEmptyCache: Seq[Int] =
    codes.select(col("__bucket")).distinct().collect()
      .map(_.getInt(0)).toSeq

  def scan(data: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, probeLists: Int,
      shortlist: Int): DataFrame = {
    val q = query.toArray
    val probed = nonEmptyCache
      .map(b => b -> NearestCentroid.distance(q, centroids(b),
        DistanceMetric.L2.id))
      .sortBy { case (b, d) => (d, b) }
      .take(probeLists).map(_._1)
    val cand = pq.adcShortlist(
      codes.filter(col("__bucket").isin(probed: _*)), query, shortlist)
    Knn.bruteForce(
      data.join(cand, data(idCol) === col("__cand_id"), "left_semi"),
      vecCol, query, k, DistanceMetric.L2, tieBreak = Some(idCol))
  }

  /** Batch KNN JOIN through the full billion-scale layout — bucket
    * routing prunes WHICH codes each query scores, PQ codes shrink
    * WHAT is read, exact re-rank restores true distances; completes
    * the serving family (brute / IVF / HNSW / PQ joins). Per query the
    * probe set is its `probeLists` nearest frozen centroids (driver:
    * |q| × lists distances, tiny); each code partition builds the
    * per-query ADC LUTs once and scores a row for a query ONLY if the
    * row's bucket is probed by that query — with the bucketed-parquet
    * layout a single-query scan is partition pruning, and here the
    * per-row bucket test is one broadcast bitset lookup. probe=lists
    * AND shortlist >= n degenerates to the exact brute join (the
    * oracle configuration); IndexSpec gates pruned recall.
    * Output: (q_id, d_id, dist, rk), L2, ties by d_id. */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
      data: DataFrame, dIdCol: String, dVecCol: String, k: Int,
      probeLists: Int, shortlist: Int): DataFrame = {
    val qRows = Pq.collectQueries(queries, qIdCol, qVecCol)
    val nonEmpty = nonEmptyCache
    // per-query probe bitset over the frozen centroids (driver:
    // |q| × lists distances, tiny)
    val probed: Array[Array[Boolean]] = qRows.map { case (_, qv) =>
      val sel = nonEmpty
        .map(b => b -> NearestCentroid.distance(qv, centroids(b),
          DistanceMetric.L2.id))
        .sortBy { case (b, dd) => (dd, b) }
        .take(probeLists).map(_._1).toSet
      Array.tabulate(centroids.length)(sel.contains)
    }
    val cand = Pq.adcCandidates(codes, qRows, pq.codebooks, shortlist,
      Some(probed))
    Knn.exactRerank(cand, queries, qIdCol, qVecCol,
      data, dIdCol, dVecCol, k)
  }

  /** Incremental insert (InsertVectorEntry contract,
    * vector_index.h:11-32): route each new row to its nearest FROZEN
    * centroid (codegen'd [[NearestCentroid]] — the same assignment the
    * IVFFlat insert path uses), encode with the FROZEN codebooks, and
    * append. Neither half retrains — the standard IVF-PQ insert
    * semantics; heavy drift calls for a rebuild. Functional: the
    * original model stays valid. */
  def insert(rows: DataFrame, idCol: String, vecCol: String): IvfPqModel = {
    val routed = rows
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__bucket",
        NearestCentroid.column(col("__v"), centroids, DistanceMetric.L2))
    val fresh = Pq.encode(routed, "id", "__v", pq.codebooks)
      .join(routed.select(col("id"), col("__bucket")), "id")
    val appended = codes.unionByName(fresh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    appended.count() // materialize while the old cache is live
    copy(codes = appended)
  }

  /** Persist the composite: codes PARTITIONED BY the IVF bucket (so a
    * loaded probe is partition pruning, mirroring IvfFlatModel.save),
    * plus the PQ codebooks and the routing centroids. Reopen with
    * [[IvfPq.load]]. */
  def save(path: String): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.write.mode("overwrite").partitionBy("__bucket")
      .parquet(path + "/codes")
    pq.codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.zipWithIndex.map { case (cw, ki) => (mi, ki, cw.toSeq) }
    }.toSeq.toDF("mi", "ki", "cw")
      .repartition(1).write.mode("overwrite").parquet(path + "/codebooks")
    centroids.toSeq.zipWithIndex.map { case (c, b) => (b, c.toSeq) }
      .toDF("b", "cv")
      .repartition(1).write.mode("overwrite").parquet(path + "/centroids")
  }

  def unpersist(): Unit = codes.unpersist()
}

object IvfPq {
  def build(df: DataFrame, idCol: String, vecCol: String,
      lists: Int, m: Int, k: Int = 256,
      metric: DistanceMetric.Value = DistanceMetric.L2,
      ivfIterations: Int = 10, pqIterations: Int = 10,
      sampleFraction: Double = 0.25): IvfPqModel = {
    // the ADC sum-of-sub-distances decomposition is an L2 identity —
    // routing by another metric would shortlist by the wrong measure
    require(metric == DistanceMetric.L2, "ivf-pq supports L2 only")
    val ivf = IvfFlat.build(df, Seq(idCol), vecCol, lists,
      probeLists = lists, metric, ivfIterations, sampleFraction)
    val pq = Pq.build(df, idCol, vecCol, m, k, pqIterations,
      sampleFraction)
    // one build-time join attaches the routing key to the codes; at
    // real scale this table is persisted partitioned by __bucket so a
    // probe becomes partition pruning. Materialize it, then drop the
    // standalone code cache — ONE resident copy of the codes
    val codes = pq.codes.join(
        ivf.buckets.select(col(idCol).cast("long").as("id"),
          col("__bucket")), "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    codes.count()
    pq.unpersist()
    IvfPqModel(ivf.centroids, pq, codes)
  }

  /** Reopen a [[IvfPqModel.save]]d index. The bucketed parquet layout
    * makes every probe a partition-pruned read. */
  def load(spark: SparkSession, path: String): IvfPqModel = {
    val codebooks = Pq.loadCodebooks(spark, path)
    val dim = codebooks.map(_.head.length).sum
    val centroids = spark.read.parquet(path + "/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    val codes = spark.read.parquet(path + "/codes")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    IvfPqModel(centroids, PqModel(codebooks, dim, codes), codes)
  }
}
