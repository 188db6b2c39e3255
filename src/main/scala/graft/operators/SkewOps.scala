package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for 100TB joins/aggregations.
  *
  * Spark's AQE skew-join (on by default in 4.x) splits oversized
  * shuffle partitions at runtime, which covers moderate skew. Salting
  * is the explicit fix when one key dwarfs everything (a null-ish
  * default, a celebrity user): it trades a bounded replication of the
  * build side for an even distribution of the probe side.
  */
object SkewOps {

  /** Inner equi-join with the LEFT side's hot keys salted.
    *
    * Left rows get a deterministic salt in [0, buckets); right rows are
    * replicated `buckets` times (one per salt value); the join key
    * becomes (key, salt), splitting each hot key's work across
    * `buckets` reducers. Exact same result set as `left.join(right,
    * keys)` — asserted in SkewSpec — at the cost of a `buckets`-fold
    * replication of the right side, so use with a SMALL right side and
    * only when AQE can't save you. Salt is hash-derived (deterministic,
    * no RNG): identical rows salt identically, keeping the join
    * reproducible. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 1, "buckets must be > 1")
    // deterministic per-row salt: spread rows of one key across buckets
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(buckets))
        .cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Two-phase (partial-then-final) aggregation for skewed group keys:
    * groupBy (key, salt) first, then re-aggregate by key. Spark's hash
    * aggregate already does map-side partial aggregation, which handles
    * most cases; the explicit form matters for aggregates whose partial
    * state is large (collect_list-ish) or when one reducer key still
    * dominates after the map-side combine. `merge` must be the
    * re-combine of `agg` outputs (sum -> sum, count -> sum, ...). */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      aggs: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)))
      .groupBy(col(key), col("__salt")).agg(aggs.head, aggs.tail: _*)
      .groupBy(col(key)).agg(merge.head, merge.tail: _*)
}
