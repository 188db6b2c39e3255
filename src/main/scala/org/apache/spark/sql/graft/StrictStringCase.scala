package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{AbstractDataType, NullType, StringType, TypeCollection}

/** `upper`/`lower` with the reference binder's STRICT argument typing:
  * non-varchar input is a bind error (reference
  * src/planner/expression_factory.cpp + p0.02-function-error.slt pins
  * `select upper(1)` as an error), where vanilla Spark would
  * implicitly cast the int to a string. RuntimeReplaceable: execution
  * is the builtin Upper/Lower, only the type check is stricter. */
case class StrictStringCase(child: Expression, toUpper: Boolean)
    extends UnaryExpression with RuntimeReplaceable with ExpectsInputTypes {
  override lazy val replacement: Expression =
    if (toUpper) Upper(child) else Lower(child)
  // NULL literals are fine (typed null strings), ints are not
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(StringType, NullType))
  override def prettyName: String = if (toUpper) "upper" else "lower"
  override protected def withNewChildInternal(c: Expression)
      : StrictStringCase = copy(child = c)
}
