package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** argmin over a (small, broadcast-as-literal) centroid set — the
  * assignment step of IVFFlat k-means, as a codegen'd expression so the
  * whole assign pass stays inside whole-stage codegen.
  *
  * Tie-break: first centroid wins (strict `<`), matching the reference's
  * FindCentroid (`src/storage/index/ivfflat_index.cpp:45-57`).
  */
case class NearestCentroid(
    child: Expression,
    centroids: Array[Array[Double]],
    metric: DistanceMetric.Value)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toDoubleArray()
    var best = 0
    var bestD = NearestCentroid.distance(vec, centroids(0), metric.id)
    var i = 1
    while (i < centroids.length) {
      val d = NearestCentroid.distance(vec, centroids(i), metric.id)
      if (d < bestD) { best = i; bestD = d }
      i += 1
    }
    best
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    // MODULE$ call: the companion class carries no static forwarder for
    // `distance` (name is shadowed by case-class members in some builds).
    val cls = NearestCentroid.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val vec = ctx.freshName("vec")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      s"""
       |double[] $vec = $a.toDoubleArray();
       |int $best = 0;
       |double $bestD = $cls.distance($vec, $cRef[0], ${metric.id});
       |for (int $i = 1; $i < $cRef.length; $i++) {
       |  double $d = $cls.distance($vec, $cRef[$i], ${metric.id});
       |  if ($d < $bestD) { $best = $i; $bestD = $d; }
       |}
       |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid =
    copy(child = c)
}

object NearestCentroid {
  /** Shared by interpreted + generated code. metricId matches
    * DistanceMetric value ids (0=L2, 1=IP, 2=Cosine). L2 here skips the
    * sqrt — argmin is unaffected and it saves a transcendental per pair. */
  def distance(a: Array[Double], b: Array[Double], metricId: Int): Double = {
    val n = a.length
    metricId match {
      case 0 =>
        var acc = 0.0; var i = 0
        while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
        acc
      case 1 =>
        var acc = 0.0; var i = 0
        while (i < n) { acc += a(i) * b(i); i += 1 }
        acc
      case _ =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  def column(vec: Column, centroids: Array[Array[Double]],
      metric: DistanceMetric.Value): Column =
    VectorDistanceApi.column(NearestCentroid(
      VectorDistanceApi.expression(vec.cast("array<double>")),
      centroids, metric))
}
