package graft

/** The text_scale harness itself, pinned small: the generator plants
  * exactly n/100 near-dup pairs, the q46 pipeline finds ALL of them
  * (at J >= 0.85 the 16x4 banding detection probability is 1 - 4e-8,
  * so recall < 1 here means a code regression, not banding luck), and
  * blocking stays dup-rate-sized (no candidate explosion). */
class TextScaleBenchSpec extends SparkSpecBase {

  test("planted near-dups: ~0.85-0.95 Jaccard, found with recall 1.0") {
    val p = TextScaleBench.runPoint(spark, 5000L)
    assert(p.planted == 50)
    assert(p.recall == 1.0, s"recall ${p.recall}")
    // blocking selectivity: candidates track the dup rate, not n^2
    assert(p.candidates < 50L * 20, s"candidate explosion: ${p.candidates}")
    assert(p.pairs >= p.planted) // verified set contains every plant
  }

  test("generator is deterministic and the mutation is a single token") {
    val a = TextScaleBench.genTokens(100L)
    val b = TextScaleBench.genTokens(101L)
    assert(a.length == b.length)
    assert(a.zip(b).count { case (x, y) => x != y } == 1)
    assert(TextScaleBench.genTokens(100L).sameElements(a)) // pure
  }
}
