package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{DistanceMetric, VectorDistanceApi}

/** User-facing vector distance API (implementation lives in
  * org.apache.spark.sql.graft.VectorDistance — a codegen'd Catalyst
  * expression). Reference semantics: SURVEY.md §2.2 vector distance row.
  */
object VectorFunctions {
  /** Euclidean distance (reference `<->` / l2_dist). */
  def l2Dist(a: Column, b: Column): Column =
    VectorDistanceApi.dist(a, b, DistanceMetric.L2)

  /** Raw (non-negated) dot product (reference `<#>` / inner_product). */
  def innerProduct(a: Column, b: Column): Column =
    VectorDistanceApi.dist(a, b, DistanceMetric.InnerProduct)

  /** cos(a,b) = dot/(|a||b|) (reference `<=>` / cosine_similarity). */
  def cosineSimilarity(a: Column, b: Column): Column =
    VectorDistanceApi.dist(a, b, DistanceMetric.Cosine)

  /** Constant query vector (reference ARRAY [..] literal,
    * `array_expression.h:27-58`). */
  def vecLit(v: Seq[Double]): Column = typedLit(v)

  /** Register l2_dist / inner_product / cosine_similarity for SQL. */
  def register(spark: SparkSession): Unit =
    VectorDistanceApi.register(spark)
}
