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

  test("substring point: planted spans recovered with exact max_span") {
    val sp = TextScaleBench.runSubstringPoint(spark, 5000L)
    assert(sp.planted == 50)
    assert(sp.recall == 1.0, s"planted-pair recall ${sp.recall}")
    // the generator-derived expectation must match the pipeline's
    // reported longest span for EVERY recovered pair — a value check,
    // not a wall-time check
    assert(sp.spanExact == 1.0, s"max_span mismatches: ${sp.spanExact}")
    // random-token docs share essentially no grams: found pairs stay
    // dup-rate-sized
    assert(sp.pairs < 50L * 3, s"span-pair explosion: ${sp.pairs}")
  }

  test("expectedMaxSpan mirrors the generator's mutation split") {
    // recompute from the tokens directly for a few planted ids
    for (id <- Seq(1L, 101L, 1001L, 9901L)) {
      val a = TextScaleBench.genTokens(id - 1)
      val b = TextScaleBench.genTokens(id)
      val p = a.zip(b).indexWhere { case (x, y) => x != y }
      val len = a.length
      val want = math.max(p, len - 1 - p)
      assert(TextScaleBench.expectedMaxSpan(id) == want,
        s"id $id: p=$p len=$len")
    }
  }

  test("generator is deterministic and the mutation is a single token") {
    val a = TextScaleBench.genTokens(100L)
    val b = TextScaleBench.genTokens(101L)
    assert(a.length == b.length)
    assert(a.zip(b).count { case (x, y) => x != y } == 1)
    assert(TextScaleBench.genTokens(100L).sameElements(a)) // pure
  }
}
