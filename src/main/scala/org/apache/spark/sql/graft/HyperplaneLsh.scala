package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, DoubleType}

/** Random-hyperplane LSH candidate test, fully inside codegen: true iff
  * the row's signature is within `maxHamming` bits of the query's
  * signature in >= 1 of the `tables` bit-groups (multi-probe).
  *
  * Signature bit i = sign(<vec, planes(i)>). Planes and the
  * precomputed query bits ride along as literal reference objects, so
  * the whole candidate filter is one narrow codegen'd predicate over
  * the scan — no shuffle, no index structure, and none of Spark's
  * interpreted higher-order array lambdas on the hot path.
  */
case class HyperplaneLshMatch(
    child: Expression,
    planes: Array[Array[Double]],
    queryBits: Array[Boolean],
    tables: Int,
    maxHamming: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(planes.length == queryBits.length &&
    planes.length % tables == 0)

  private val bitsPerTable = planes.length / tables

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = BooleanType
  override def prettyName: String = "lsh_candidate"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    HyperplaneLshMatch.matches(v, planes, queryBits, tables, bitsPerTable,
      maxHamming)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("planes", planes, "double[][]")
    val q = ctx.addReferenceObj("qbits", queryBits, "boolean[]")
    val cls = HyperplaneLshMatch.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      s"""
       |double[] $v = $a.toDoubleArray();
       |${ev.value} = $cls.matches($v, $p, $q, $tables, $bitsPerTable,
       |  $maxHamming);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression)
      : HyperplaneLshMatch = copy(child = c)
}

object HyperplaneLshMatch {
  /** Shared by interpreted + generated code. Early-outs per table once
    * the hamming budget is blown. */
  def matches(v: Array[Double], planes: Array[Array[Double]],
      qbits: Array[Boolean], tables: Int, bitsPerTable: Int,
      maxHamming: Int): Boolean = {
    val dim = v.length
    var t = 0
    while (t < tables) {
      var ham = 0
      var b = 0
      while (b < bitsPerTable && ham <= maxHamming) {
        val i = t * bitsPerTable + b
        val plane = planes(i)
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += v(j) * plane(j); j += 1 }
        if ((dot > 0) != qbits(i)) ham += 1
        b += 1
      }
      if (ham <= maxHamming) return true
      t += 1
    }
    false
  }

  def column(vec: Column, planes: Array[Array[Double]],
      queryBits: Array[Boolean], tables: Int, maxHamming: Int): Column =
    VectorDistanceApi.column(HyperplaneLshMatch(
      VectorDistanceApi.expression(vec.cast("array<double>")),
      planes, queryBits, tables, maxHamming))
}
