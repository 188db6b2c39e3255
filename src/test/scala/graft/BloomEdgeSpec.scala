package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomSemi

/** Degenerate-input contracts for the bloom semi-join primitive. */
class BloomEdgeSpec extends SparkSpecBase {

  test("empty build side: null sketch, probe matches NOTHING (exact for empty dim)") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k")
    val bloom = BloomSemi.build(empty, col("k"), 100L)
    assert(bloom == null)
    val survivors = Seq(1L, 2L, 3L).toDF("k")
      .filter(BloomSemi.mightContain(bloom, col("k"))).count()
    assert(survivors == 0L)
  }

  test("probe admits every true member (zero false negatives)") {
    import spark.implicits._
    val keys = (1L to 500L).toDF("k")
    val bloom = BloomSemi.build(keys.filter(col("k") % 7 === 0), col("k"), 100L)
    val trueMembers = keys.filter(col("k") % 7 === 0)
    val admitted = trueMembers
      .filter(BloomSemi.mightContain(bloom, col("k"))).count()
    assert(admitted == trueMembers.count())
  }
}
