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

  /** Batch KNN JOIN — top-k data neighbors for EVERY query row, the
    * Spark-native form of vector serving (one job, not Q sequential
    * scans). Exact: broadcast the query set (queries are the small
    * side by construction), codegen'd distance on the crossed pairs,
    * then row_number-over-window top-k per query. The data side stays
    * partition-parallel and is scanned ONCE regardless of |queries|.
    *
    * Output: (q_id, d_id, dist, rk) — k rows per query,
    * distance-ascending; join back on the ids for payload columns.
    * For the index-accelerated variant see IvfFlatModel.knnJoin. */
  def join(queries: DataFrame, qVecCol: String, qIdCol: String,
      data: DataFrame, dVecCol: String, dIdCol: String, k: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, row_number}
    val q = queries.select(col(qIdCol).as("q_id"),
      col(qVecCol).cast("array<double>").as("__qv"))
    val d = data.select(col(dIdCol).as("d_id"),
      col(dVecCol).cast("array<double>").as("__dv"))
    val w = Window.partitionBy("q_id").orderBy(col("dist").asc,
      col("d_id").asc)
    d.crossJoin(broadcast(q))
      .withColumn("dist", metricCol(col("__dv"), col("__qv"), metric))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("q_id"), col("d_id"), col("dist"), col("__rk").as("rk"))
  }
}
