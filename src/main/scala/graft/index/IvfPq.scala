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
  * carry the IVF bucket id, so a probe is a codegen'd filter (or
  * partition pruning when the code table is persisted bucketed).
  *
  * probe_lists = lists AND shortlist >= n degenerates to exact brute
  * force — the configuration the q69 oracle pins; IndexSpec gates the
  * pruned+compressed configuration's recall. */
final case class IvfPqModel(
    ivf: IvfFlatModel,
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
      .map(b => b -> NearestCentroid.distance(q, ivf.centroids(b),
        ivf.metric.id))
      .sortBy { case (b, d) => (d, b) }
      .take(probeLists).map(_._1)
    val cand = pq.adcShortlist(
      codes.filter(col("__bucket").isin(probed: _*)), query, shortlist)
    Knn.bruteForce(
      data.join(cand, data(idCol) === col("__cand_id"), "left_semi"),
      vecCol, query, k, ivf.metric, tieBreak = Some(idCol))
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
    IvfPqModel(ivf, pq, codes)
  }
}
