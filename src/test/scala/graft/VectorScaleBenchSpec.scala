package graft

import org.apache.spark.sql.functions._

/** vector_scale harness pins: the noise-guard merge semantics and the
  * hard-corpus generator's determinism (the two pieces BENCH_DETAIL's
  * credibility rests on — the measured numbers themselves live in the
  * artifact, not in assertions). */
@Slow
class VectorScaleBenchSpec extends SparkSpecBase {

  test("noise-guard merge: per-metric min, MIN recall, auditable first run") {
    import VectorScaleBench.{IndexPoint, Point}
    val slow = Point(1000L, 0.2, 3.0,
      Seq("ivfflat" -> IndexPoint(10.0, 1.0, 1.0),
        "hnsw" -> IndexPoint(40.0, 0.5, 0.92)))
    val fast = Point(1000L, 0.1, 1.5,
      Seq("ivfflat" -> IndexPoint(4.0, 1.1, 0.98),
        "hnsw" -> IndexPoint(14.0, 0.6, 0.92)))
    val m = VectorScaleBench.merged(slow, fast)
    val idx = m.idx.toMap
    assert(m.bruteSec == 1.5)
    assert(idx("ivfflat").build == 4.0 && idx("ivfflat").scan == 1.0)
    assert(idx("hnsw").build == 14.0 && idx("hnsw").scan == 0.5)
    // recall merges with MIN — the conservative direction for a gate
    assert(idx("ivfflat").recall == 0.98)
    assert(m.first.contains(slow),
      "a >1.3x disagreement keeps the first run auditable")
    val q = VectorScaleBench.merged(fast, fast)
    assert(q.first.isEmpty, "identical runs carry no audit blob")
  }

  test("hard corpus is deterministic and unclustered") {
    val a = VectorScaleBench.corpusHard(spark, 500L, 16)
      .orderBy("vec_id").collect()
    val b = VectorScaleBench.corpusHard(spark, 500L, 16)
      .repartition(7).orderBy("vec_id").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "pure function of the id — identical under any partitioning")
    // unclustered: per-dimension mean ~ 0 over [-1, 1) uniform draws
    val mean = VectorScaleBench.corpusHard(spark, 2000L, 16)
      .select(explode(col("embedding")).as("x"))
      .agg(avg("x")).head().getDouble(0)
    assert(math.abs(mean) < 0.05, s"uniform coordinates, got mean $mean")
  }
}
