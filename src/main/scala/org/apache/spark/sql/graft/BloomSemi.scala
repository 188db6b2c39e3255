/* Lives under org.apache.spark.sql to access private[sql] helpers
 * (ExpressionUtils) and the catalyst bloom-filter expressions — the
 * standard pattern for libraries adding native Catalyst plumbing. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join building blocks — the runtime-filter pattern
  * Spark's own `InjectRuntimeFilter` rule uses (BloomFilterAggregate on
  * the build side, BloomFilterMightContain(XxHash64) on the probe
  * side), exposed as a library operator for the case the optimizer
  * can't see: a dimension table far too big to broadcast as an exact
  * key set (100M+ keys) but whose *bloom filter* is a few MB.
  *
  * Scale shape: the filter is built DISTRIBUTED (partial sketches
  * merged by the aggregate — only fixed-size bitmaps move, never
  * keys), the probe is a map-side codegen'd predicate on the 100TB
  * fact side BEFORE its shuffle, and the exact verification semi-join
  * afterwards only pays for rows that survived (matches + the bloom's
  * ~fpp false positives). Correctness is exact regardless of fpp.
  *
  * Reference anchor: the reference has no runtime filters — this is
  * part of the beyond-parity scale surface (SURVEY.md §7.4), built on
  * public Spark internals only.
  */
object BloomSemi {

  /** Distributed bloom-filter build over `keys` (any type; hashed to
    * long with XxHash64 like InjectRuntimeFilter). Returns the
    * serialized filter — O(numBits/8) bytes on the driver, never the
    * keys themselves. An EMPTY build side yields null (the aggregate
    * has nothing to sketch); [[mightContain]] treats that as
    * match-nothing, which is exact for a semi-join against an empty
    * dim. */
  def build(df: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val hashed = new XxHash64(Seq(ExpressionUtils.expression(key)))
    val agg = new BloomFilterAggregate(hashed, expectedItems)
      .toAggregateExpression()
    val row = df.select(ExpressionUtils.column(agg)).head()
    row.getAs[Array[Byte]](0)
  }

  /** Codegen'd `might_contain(filter, xxhash64(key))` probe predicate.
    * False positives possible (verify with an exact join after); false
    * negatives impossible. A null `filter` (empty build side) matches
    * nothing. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    if (filter == null) org.apache.spark.sql.functions.lit(false)
    else ExpressionUtils.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(key)))))
}
