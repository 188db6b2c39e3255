package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Distance-function identities (reference vector_expression.h:19-63)
  * checked property-style over seeded random vectors, plus
  * codegen-vs-interpreted agreement. */
class VectorDistanceSpec extends SparkSpecBase {

  private val rnd = new scala.util.Random(7)
  private def randVec(): List[Double] = {
    val n = 2 + rnd.nextInt(15)
    List.fill(n)(rnd.nextDouble() * 200 - 100)
  }

  private def evalPair(a: Seq[Double], b: Seq[Double]): (Double, Double, Double) = {
    import spark.implicits._
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(
      l2Dist(col("a"), col("b")),
      innerProduct(col("a"), col("b")),
      cosineSimilarity(col("a"), col("b"))).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  test("l2(a,a)=0, symmetry, ip bilinear, cosine bounds") {
    (1 to 15).foreach { _ =>
      val a = randVec()
      val (l2aa, ipaa, cosaa) = evalPair(a, a)
      assert(l2aa == 0.0)
      assert(math.abs(ipaa - a.map(x => x * x).sum) < 1e-6 * (1 + ipaa.abs))
      assert(math.abs(cosaa - 1.0) < 1e-9 || a.forall(_ == 0.0))
      val b = a.map(_ + 1.0) // same dim
      val (l2ab, ipab, cosab) = evalPair(a, b)
      val (l2ba, ipba, cosba) = evalPair(b, a)
      assert(l2ab == l2ba && ipab == ipba && cosab == cosba)
      assert(cosab >= -1.0 - 1e-9 && cosab <= 1.0 + 1e-9)
      // reference semantics: l2 has sqrt; ip raw (not negated)
      val exp = math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(math.abs(l2ab - exp) < 1e-9 * (1 + exp))
    }
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(-4.0, 5.5, 0.25))).toDF("a", "b")
    val cg = df.select(l2Dist(col("a"), col("b")),
      innerProduct(col("a"), col("b")),
      cosineSimilarity(col("a"), col("b"))).head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(l2Dist(col("a"), col("b")),
        innerProduct(col("a"), col("b")),
        cosineSimilarity(col("a"), col("b"))).head()
      assert(cg == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("dimension mismatch throws") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception](
      df.select(l2Dist(col("a"), col("b"))).collect())
    assert(e.getMessage.contains("dimension mismatch")
      || e.getCause != null)
  }

  test("SQL registration serves all three functions") {
    VectorFunctionsRegistrar.ensure(spark)
    val r = spark.sql(
      """SELECT l2_dist(array(0D,3D), array(4D,0D)) l2,
        |inner_product(array(1D,2D), array(3D,4D)) ip,
        |cosine_similarity(array(1D,0D), array(0D,1D)) c""".stripMargin).head()
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 11.0
      && r.getDouble(2) == 0.0)
    // function form of the vector constructor (all-double coercion)
    val c = spark.sql(
      "SELECT l2_dist(construct_array(0, 3), construct_array(4, 0))").head()
    assert(c.getDouble(0) == 5.0)
  }

  test("SignBits64: bit semantics, codegen == eval, >64-dim truncation") {
    import spark.implicits._
    import org.apache.spark.sql.graft.SignBits64
    // bit i == v(i) > 0; zeros and negatives clear
    assert(SignBits64.bits(Seq(1.0, -1.0, 0.0, 0.5)) == ((1L << 0) | (1L << 3)))
    assert(SignBits64.bits(Seq.fill(64)(1.0)) == -1L) // all 64 bits set
    assert(SignBits64.bits(Seq.fill(70)(1.0)) == -1L) // dims >64 ignored
    val df = Seq((1L, Seq(0.3, -0.2, 0.1)), (2L, Seq(-0.3, 0.2, -0.1)))
      .toDF("id", "v")
    val got = df.select(col("id"),
        SignBits64.column(col("v")).as("code"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 5L, 2L -> 2L))
    // Hamming(code, code') via bit_count(xor) — the q120 shortlist op
    val ham = df.select(bit_count(lit(got(1L)).bitwiseXOR(lit(got(2L)))))
      .head().getInt(0)
    assert(ham == 3)
  }

  test("q120 shortlist recall: sign-bit cascade finds >=70% of exact top-10") {
    import org.apache.spark.sql.graft.{DistanceMetric, SignBits64}
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val qCode = SignBits64.bits(q)
    val shortlist = emb.select(col("vec_id"), col("embedding"),
        SignBits64.column(col("embedding")).as("code"))
      .orderBy(bit_count(col("code").bitwiseXOR(lit(qCode))).asc,
        col("vec_id").asc)
      .limit(50)
    val cos = graft.index.Knn.distCol(
      col("embedding").cast("array<double>"), q, DistanceMetric.Cosine)
    val approx = shortlist.orderBy(cos.desc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = emb.orderBy(cos.desc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = approx.intersect(exact).size / 10.0
    assert(recall >= 0.7, s"recall $recall")
  }

  test("q145 hard negatives: other-label only, exact top-5 vs brute") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val res = graft.operators.VectorOps
      .queries("q145_hard_negatives")(spark, sfDir).collect()
    val labelOf = e.map(x => x._1 -> x._3).toMap
    val byAnchor = res.groupBy(_.getAs[Long]("anchor_id"))
    val anchors = e.filter(_._1 % 20 == 0)
    assert(byAnchor.keySet == anchors.map(_._1).toSet)
    anchors.foreach { case (aid, av, al) =>
      val expect = e.filter(_._3 != al)
        .map { case (id, v, _) => (id, cos(av, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
      val got = byAnchor(aid).sortBy(_.getAs[Int]("rk"))
        .map(_.getAs[Long]("neg_id")).toSeq
      assert(got == expect, s"anchor $aid")
      got.foreach(n => assert(labelOf(n) != al))
    }
  }

  test("q182 retrieval metrics: bounded, self excluded, sane aggregate") {
    val rows = graft.operators.VectorOps
      .queries("q182_retrieval_metrics")(spark, sfDir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (m, n) = (r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"))
      assert(m >= 0.0 && m <= 1.0, r.toString)
      assert(n >= 0.0 && n <= 1.0 + 1e-9, r.toString)
    }
    // the 32-dim prefix carries half the signal: the cascade should
    // not collapse (mean nDCG well above chance)
    val mean = rows.map(_.getAs[Double]("ndcg")).sum / rows.length
    assert(mean > 0.5, s"mean nDCG $mean")
  }

  test("q169 PCA: loadings align with an unconstrained float power iteration") {
    import org.apache.spark.sql.functions._
    // independent math check (not the cross-engine pin): rebuild the
    // Gram matrix in plain doubles on the driver, run 300 unscaled
    // power-iteration rounds, and require the q169 component to point
    // the same way (|cos| > 0.999) with a matching eigenvalue
    val rows = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val dim = rows.head.length
    val c = Array.ofDim[Double](dim, dim)
    rows.foreach { x =>
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { c(i)(j) += x(i) * x(j); j += 1 }
        i += 1
      }
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var lam = 0.0
    for (_ <- 1 to 300) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * v(j)).sum)
      lam = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / lam)
    }
    val got = graft.operators.VectorOps.queries("q169_pca_power")(
      spark, sfDir).collect()
    val eig = got.head.getAs[Double]("eigenvalue")
    assert(math.abs(eig - lam) / lam < 1e-3, s"eigenvalue $eig vs $lam")
    // compare direction on the reported top-8 dims
    val dot = got.map(r =>
      r.getAs[Double]("loading") * v(r.getAs[Int]("dim"))).sum
    val na = math.sqrt(got.map(r => math.pow(r.getAs[Double]("loading"), 2)).sum)
    val nb = math.sqrt(got.map(r => math.pow(v(r.getAs[Int]("dim")), 2)).sum)
    assert(math.abs(dot) / (na * nb) > 0.999,
      s"component direction drifted: ${math.abs(dot) / (na * nb)}")
  }

  test("q228 int8 quant audit: zero vector, exact-grid vector, " +
      "hand-computed error") {
    import spark.implicits._
    // label 0: zero vector -> counted, zero error
    // label 1: components are exact multiples of s = 127/127 = 1.0
    //   (max|x| = 127) -> reconstructs exactly, mse 0
    // label 2: (1.0, 0.3): s = 1/127; 0.3/s = 38.1 -> q = 38;
    //   deq = 38/127; err = 0.3 - 38/127; mse = err^2 / 2
    val e = Seq(
      (0, Array(0.0f, 0.0f)),
      (1, Array(127.0f, 64.0f)),
      (2, Array(1.0f, 0.3f))
    ).toDF("label", "embedding")
    val r = graft.operators.VectorOps.int8QuantAudit(e).collect()
      .map(x => x.getAs[Int]("label") -> x).toMap
    assert(r(0).getAs[Long]("n_zero_vecs") == 1L)
    assert(r(0).getAs[Double]("avg_mse") == 0.0)
    assert(r(0).getAs[Double]("max_abs_err") == 0.0)
    assert(r(1).getAs[Double]("avg_mse") == 0.0)
    assert(r(1).getAs[Long]("n_zero_vecs") == 0L)
    val s = 1.0 / 127.0
    val err = 0.3f.toDouble - math.round(0.3f.toDouble / s) * s
    def r8(v: Double) = BigDecimal(v)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(2).getAs[Double]("avg_mse") == r8(r8(err * err / 2.0)))
    assert(r(2).getAs[Double]("max_abs_err") == r8(math.abs(err)))
  }

  test("q244 JL audit: exact closed forms on hand pairs") {
    import spark.implicits._
    def audit(rows: (Long, Seq[Double])*) =
      graft.operators.VectorOps.jlAudit(
        rows.toDF("vec_id", "v"), k = 16).head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // identical adjacent vectors: zero original distance (and, by
    // linearity, zero projected distance) -> degenerate, never a NaN
    val dg = audit((0L, Seq(1.0, 2.0)), (1L, Seq(1.0, 2.0)))
    assert(dg.getAs[Long]("n_pairs") == 1L)
    assert(dg.getAs[Long]("n_degenerate") == 1L)
    assert(dg.isNullAt(dg.fieldIndex("mean_ratio")))
    // 1-dim: y = x * the sign vector, so ||dy||^2 = k*||dx||^2 and
    // the ratio is EXACTLY 1 at any scale
    val one = audit((0L, Seq(3.0)), (1L, Seq(0.0)))
    assert(one.getAs[Long]("n_pairs") == 1L)
    assert(one.getAs[Double]("mean_ratio") == 1.0)
    assert(one.getAs[Double]("frac_in_band") == 1.0)
    // 2-dim hand case: dy_j = s(0,j) + s(1,j) in {-2, 0, 2}, so
    // p2 = 4 * |{j : signs agree}| and ratio = p2 / (16 * 2) — the
    // signs recomputed here with the SAME integer grid
    def s(i: Long, j: Long): Double =
      if ((i * 1103515245L + j * 12345L) % 97 % 2 == 0) 1.0 else -1.0
    val agree = (0L until 16L).count(j => s(0, j) == s(1, j))
    val two = audit((0L, Seq(1.0, 1.0)), (1L, Seq(0.0, 0.0)))
    assert(two.getAs[Double]("mean_ratio") == r6(4.0 * agree / 32.0))
    assert(agree > 0 && agree < 16, s"degenerate sign grid: $agree")
  }
}

object VectorFunctionsRegistrar {
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.VectorFunctions.register(spark)
}
