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
      metric: DistanceMetric.Value): Column = metric match {
    case DistanceMetric.L2           => l2Dist(vec, vecLit(query))
    case DistanceMetric.InnerProduct => innerProduct(vec, vecLit(query))
    case DistanceMetric.Cosine       => cosineSimilarity(vec, vecLit(query))
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
}
