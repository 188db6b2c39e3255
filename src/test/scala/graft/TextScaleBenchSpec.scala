package graft

/** The text_scale harness itself, pinned small: the generator plants
  * exactly n/100 near-dup pairs, the q46 pipeline finds ALL of them
  * (at J >= 0.85 the 16x4 banding detection probability is 1 - 4e-8,
  * so recall < 1 here means a code regression, not banding luck), and
  * blocking stays dup-rate-sized (no candidate explosion). */
@Slow
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

  test("heavy-hitter point: exactly the planted template at exact count") {
    val hp = TextScaleBench.runHhPoint(spark, 5000L)
    assert(hp.found == 4, s"found ${hp.found} heavy shingles")
    assert(hp.countOk, "a template shingle's exact count is off")
  }

  test("web point: every closed form holds on every generated doc") {
    val wp = TextScaleBench.runWebPoint(spark, 5000L)
    assert(wp.docs == 5000L)
    assert(wp.ok, s"${wp.badRows} docs violated an HTML closed form")
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

  test("hard generator: exactly k distinct mutations per class, J ordered by k") {
    def jacc(a: Array[String], b: Array[String]): Double = {
      def sh(t: Array[String]) = t.sliding(3).map(_.mkString(" ")).toSet
      val (x, y) = (sh(a), sh(b))
      x.intersect(y).size.toDouble / x.union(y).size
    }
    // class k = (id/100) % 3 -> 2, 4, 8 mutated tokens, all distinct
    val byK = Seq(1L, 101L, 201L, 301L, 401L, 501L).map { id =>
      val a = TextScaleBench.genTokensHard(id - 1)
      val b = TextScaleBench.genTokensHard(id)
      val k = TextScaleBench.hardK(id)
      assert(a.length == b.length, s"id $id")
      assert(a.zip(b).count { case (x, y) => x != y } == k,
        s"id $id: expected $k mutations")
      // unchanged ids replay the base corpus generator exactly
      assert(TextScaleBench.genTokensHard(id - 1).sameElements(a))
      k -> jacc(a, b)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    // more mutations -> strictly harder pairs
    assert(byK(2) > byK(4) && byK(4) > byK(8),
      s"Jaccard must fall with k: $byK")
    assert(byK(8) < 0.6, s"k=8 class must sit below the easy zone: $byK")
  }

  test("banding sweep: recall rises with bands per class; k8 separates configs") {
    val sw = TextScaleBench.runSweep(spark, 5000L)
    assert(sw.settings.map(_.bands) == Seq(8, 16, 32))
    val byBands = sw.settings.map(s => s.bands -> s).toMap
    for (k <- Seq(2, 4, 8)) {
      val r8 = byBands(8).recallByK(k)
      val r16 = byBands(16).recallByK(k)
      val r32 = byBands(32).recallByK(k)
      assert(r8 <= r16 + 1e-9 && r16 <= r32 + 1e-9,
        s"k=$k recall must be monotone in bands: $r8 / $r16 / $r32")
    }
    // the hard class genuinely discriminates: 8x8 misses most k=8
    // pairs, 32x2 finds most of them
    assert(byBands(8).recallByK(8) < 0.4, s"${byBands(8)}")
    assert(byBands(32).recallByK(8) > 0.8, s"${byBands(32)}")
    // permissive banding pays in candidates, never fewer
    assert(byBands(32).candidates >= byBands(8).candidates)
  }
}
