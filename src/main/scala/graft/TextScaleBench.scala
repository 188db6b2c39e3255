package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** The near-dup-dedup twin of [[VectorScaleBench]]: the MinHash-LSH
  * pipeline (the q46 operator path — 64-hash signatures, 16×4 banding,
  * salted bucket self-join, exact-Jaccard verify) run on a generated
  * corpus at 100k and 1M documents, far beyond the driver tables'
  * 5k-doc ceiling. The corpus is deterministic (splitmix64 off the
  * row id, generated distributed — never collected) and carries
  * PLANTED near-duplicates with known ground truth: every doc id with
  * id % 100 == 1 is a one-token mutation of doc id-1 (3-gram Jaccard
  * ≈ 0.85–0.95, above the 0.8 operator threshold), so the bench can
  * report true RECALL of the planted pairs, not just wall time.
  *
  * Reported per size point:
  *   - gen_sec: corpus generate+persist wall;
  *   - lsh_sec: end-to-end near-dup extraction (shingle → signature →
  *     banded bucket join → exact verify), best-of-2;
  *   - candidate_pairs vs allpairs (the blocking ratio — the number
  *     that decides 100 TB feasibility: candidates must track the dup
  *     rate, not n²);
  *   - recall_planted: fraction of the n/100 planted pairs surviving
  *     the full pipeline (banding is probabilistic; at J≥0.85 the
  *     16×4 scheme detects with p > 1 - 4e-8, so anything below ~1.0
  *     means a real regression, not banding luck).
  */
object TextScaleBench {

  val Vocab = 4096
  val JaccardThr = 0.8

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Doc `id`'s token stream. Ids with id % 100 == 1 replay id-1's
    * stream with ONE token substituted (position mix(id) % len) —
    * the planted near-duplicate. Pure function of id: deterministic
    * under any partitioning. */
  private[graft] def genTokens(id: Long): Array[String] = {
    val base = if (id % 100 == 1) id - 1 else id
    val len = 40 + (mix(base * 7 + 1) & 0x7fffffff).toInt % 40
    val toks = Array.tabulate(len) { j =>
      "w" + ((mix(base * 0x100000001B3L + j) & 0x7fffffff) % Vocab)
    }
    if (id % 100 == 1) {
      val p = ((mix(id) & 0x7fffffff) % len).toInt
      toks(p) = "m" + ((mix(id * 31 + 7) & 0x7fffffff) % Vocab)
    }
    toks
  }

  def corpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map(id => (id, genTokens(id).mkString(" "))))
      .toDF("doc_id", "text")
  }

  /** Mutation count of a planted pair in the HARD corpus, by id
    * class: (id/100) % 3 -> 2, 4 or 8 mutated tokens. With 3-gram
    * shingles each mutation destroys ~3 shingles per side, so the
    * classes land at J ≈ 0.72–0.87, 0.52–0.73 and 0.23–0.52 — the
    * range where (bands × rows) genuinely decides detection. */
  private[graft] def hardK(id: Long): Int =
    Array(2, 4, 8)(((id / 100) % 3).toInt)

  /** The HARD planted corpus: like [[genTokens]] but planted ids
    * mutate k distinct tokens (k per [[hardK]]), pushing pairs near
    * and below the banding threshold instead of safely above it. */
  private[graft] def genTokensHard(id: Long): Array[String] = {
    val base = if (id % 100 == 1) id - 1 else id
    val len = 40 + (mix(base * 7 + 1) & 0x7fffffff).toInt % 40
    val toks = Array.tabulate(len) { j =>
      "w" + ((mix(base * 0x100000001B3L + j) & 0x7fffffff) % Vocab)
    }
    if (id % 100 == 1) {
      val taken = new Array[Boolean](len)
      var j = 0
      val k = hardK(id)
      while (j < k) {
        var p = ((mix(id * 13 + j) & 0x7fffffff) % len).toInt
        while (taken(p)) p = (p + 1) % len // distinct positions
        taken(p) = true
        toks(p) = "m" + ((mix(id * 31 + 7 * (j + 1)) & 0x7fffffff) % Vocab)
        j += 1
      }
    }
    toks
  }

  def corpusHard(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions(_.map(id => (id, genTokensHard(id).mkString(" "))))
      .toDF("doc_id", "text")
  }

  private def timeIt[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The q46 operator path over an arbitrary (doc_id, text) frame:
    * distinct 3-gram shingles → MinHash(64)/16-band keys → salted
    * bucket self-join → exact-Jaccard verify on the candidates.
    * Returns (verified near-dup pairs, raw candidate count). */
  private def lshPairs(docs: DataFrame): (DataFrame, Long) = {
    val sh = docs
      .select(col("doc_id"),
        org.apache.spark.sql.graft.DistinctShingles.column(
          operators.TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sh.select(col("doc_id"),
        posexplode(org.apache.spark.sql.graft.MinHashBands.column(
          col("sh"), numHashes = 64, bands = 16)).as(Seq("band", "bkey")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = DedupOps.bucketPairs(bands, Seq("band", "bkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = cand.count()
    // exact verify: candidates are few (dup-rate-sized), so the
    // shingle-set join is the cheap tail of the pipeline
    val verified = cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("inter",
        size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("jacc", col("inter") /
        (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jacc") >= JaccardThr)
      .select("a_id", "b_id")
    val out = verified.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    Seq(sh, bands, cand).foreach(_.unpersist())
    (out, nCand)
  }

  private def r3(v: Double): Double = math.rint(v * 1000) / 1000

  /** One banding configuration's candidate extraction (shingle →
    * MinHash(64)/`bands` band keys → salted bucket self-join): the
    * probabilistic stage the (bands × rows) tradeoff lives in.
    * Returns the candidate-pair frame — recall of planted pairs in
    * THIS set is banding recall, before any verify threshold. */
  private def candidatePairs(docs: DataFrame, bands: Int): DataFrame = {
    val sh = docs
      .select(col("doc_id"),
        org.apache.spark.sql.graft.DistinctShingles.column(
          operators.TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val bnd = sh.select(col("doc_id"),
      posexplode(org.apache.spark.sql.graft.MinHashBands.column(
        col("sh"), numHashes = 64, bands = bands)).as(Seq("band", "bkey")))
    DedupOps.bucketPairs(bnd, Seq("band", "bkey"))
  }

  final case class SweepSetting(bands: Int, lshSec: Double,
      candidates: Long, recallByK: Map[Int, Double]) {
    def json: String = {
      val rk = recallByK.toSeq.sortBy(_._1)
        .map { case (k, r) => s""""k$k":${r3(r)}""" }.mkString(",")
      s"""{"bands":$bands,"rows_per_band":${64 / bands},""" +
        s""""lsh_sec":${r3(lshSec)},"candidate_pairs":$candidates,""" +
        s""""cand_recall":{$rk}}"""
    }
  }
  final case class SweepResult(n: Long, plantedByK: Map[Int, Long],
      settings: Seq[SweepSetting]) {
    def json: String = {
      val pk = plantedByK.toSeq.sortBy(_._1)
        .map { case (k, c) => s""""k$k":$c""" }.mkString(",")
      s"""{"corpus":"hard-planted","n":$n,"planted":{$pk},""" +
        s""""settings":[${settings.map(_.json).mkString(",")}]}"""
    }
  }

  /** The banding-parameter sweep on the HARD corpus — the text twin
    * of vector_scale's `hard` section: for 64 MinHashes split as
    * 8×8 / 16×4 / 32×2, measure wall time, candidate volume and
    * PER-CLASS banding recall of pairs planted at J ≈ 0.8 / 0.6 /
    * 0.35. The recall column must visibly move with the config (8×8
    * misses nearly all k=8 pairs, 32×2 finds most) and the candidate
    * column carries the cost of the permissive configs — the
    * executed recall-vs-cost tradeoff, not the argued one. */
  def runSweep(spark: SparkSession, n: Long): SweepResult = {
    val docs = corpusHard(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val plantedIds = (1L until n by 100L).toSeq
    val byK = plantedIds.groupBy(hardK)
    val settings = Seq(8, 16, 32).map { bands =>
      def once(): (Set[(Long, Long)], Double) = {
        val (pairs, t) = timeIt {
          candidatePairs(docs, bands).select("a_id", "b_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        }
        (pairs, t)
      }
      val (found, t1) = once()
      val (_, t2) = once() // best-of-2, steady-state
      val recall = byK.map { case (k, ids) =>
        val hit = ids.count(id => found.contains((id - 1, id))
          || found.contains((id, id - 1)))
        k -> (if (ids.isEmpty) 1.0 else hit.toDouble / ids.size)
      }
      SweepSetting(bands, math.min(t1, t2), found.size, recall)
    }
    docs.unpersist()
    SweepResult(n, byK.map { case (k, ids) => k -> ids.size.toLong },
      settings)
  }

  final case class Point(n: Long, genSec: Double, lshSec: Double,
      candidates: Long, pairs: Long, planted: Long, recall: Double,
      lshFirst: Double = -1.0) {
    def json: String = {
      val allPairs = n.toDouble * (n - 1) / 2
      // lsh_sec is already a best-of-2 (the same noise treatment
      // queries get); when the discarded first pass read >1.3× the
      // kept one, it stays in the artifact as lsh_first_sec — an
      // inflated reading should be auditable, not invisible.
      val audit =
        if (lshFirst > 1.3 * lshSec && lshFirst - lshSec > 0.5)
          s""","lsh_first_sec":${r3(lshFirst)}""" else ""
      s"""{"n":$n,"gen_sec":${r3(genSec)},"lsh_sec":${r3(lshSec)},""" +
        s""""candidate_pairs":$candidates,"verified_pairs":$pairs,""" +
        s""""allpairs_ratio":${candidates / allPairs},""" +
        s""""planted":$planted,"recall_planted":${r3(recall)}$audit}"""
    }
  }
  /** One size point of the q184 substring-dedup pipeline on the same
    * planted corpus. The mutation at position p splits doc (id-1, id)
    * into shared spans of p and len-1-p tokens, so the EXACT expected
    * max_span of every planted pair is computable from the generator —
    * `max_span_exact` is the fraction of recovered planted pairs whose
    * reported longest span equals it (value-checked scale execution,
    * not just wall time). */
  final case class SubPoint(n: Long, subSec: Double, pairs: Long,
      planted: Long, recall: Double, spanExact: Double,
      subFirst: Double = -1.0) {
    def json: String = {
      val audit =
        if (subFirst > 1.3 * subSec && subFirst - subSec > 0.5)
          s""","sub_first_sec":${r3(subFirst)}""" else ""
      s"""{"n":$n,"sub_sec":${r3(subSec)},"pairs_found":$pairs,""" +
        s""""planted":$planted,"recall_planted":${r3(recall)},""" +
        s""""max_span_exact":${r3(spanExact)}$audit}"""
    }
  }
  final case class WebPoint(n: Long, htmlSec: Double, docs: Long,
      badRows: Long, htmlFirst: Double = -1.0) {
    def ok: Boolean = badRows == 0
    def json: String = {
      val audit =
        if (htmlFirst > 1.3 * htmlSec && htmlFirst - htmlSec > 0.5)
          s""","html_first_sec":${r3(htmlFirst)}""" else ""
      s"""{"n":$n,"html_sec":${r3(htmlSec)},"docs":$docs,""" +
        s""""html_ok":$ok$audit}"""
    }
  }

  /** q281's HTML-extraction pipeline over the generated corpus —
    * the web tier's scale point: synthesize one full page per doc,
    * strict-parse it back, and verify EVERY closed form (element /
    * comment / entity / self-closing / text-token counts) in-engine
    * on every row. All narrow per-row work; wall time must track n
    * linearly. */
  def runWebPoint(spark: SparkSession, n: Long): WebPoint = {
    import spark.implicits._
    import graft.operators.WebOps
    val docs = corpus(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def once(): ((Long, Long), Double) = timeIt {
      val r = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val toks = text.trim.toLowerCase.split("\\s+")
          val p = WebOps.parseHtml(id, WebOps.encodeHtml(id, toks))
          val m = toks.length.toLong
          val bad =
            (if (p.n_elements == 7 + m + m / 17 + m / 13) 0 else 1) +
              (if (p.n_comments == m / 11) 0 else 1) +
              (if (p.n_entities == m / 7) 0 else 1) +
              (if (p.n_selfclosing == m / 13) 0 else 1) +
              (if (p.n_text_tokens == 2 + m + m / 7) 0 else 1)
          (1L, bad.toLong)
        })
        .toDF("one", "bad")
        .agg(sum("one"), sum("bad")).head()
      (r.getLong(0), r.getLong(1))
    }
    val ((d1, b1), t1) = once() // single run (see runPoint)
    docs.unpersist()
    WebPoint(n, t1, d1, b1, htmlFirst = t1)
  }

  private[graft] def mergedWeb(a: WebPoint, b: WebPoint): WebPoint =
    WebPoint(a.n, math.min(a.htmlSec, b.htmlSec), a.docs,
      math.max(a.badRows, b.badRows),
      htmlFirst = math.max(a.htmlFirst, b.htmlFirst))

  final case class Result(points: Seq[Point],
      sub: Seq[SubPoint] = Seq.empty,
      sweep: Option[SweepResult] = None,
      hh: Seq[HhPoint] = Seq.empty,
      web: Seq[WebPoint] = Seq.empty) {
    def json: String =
      s"""{"bands":16,"rows_per_band":4,"jaccard_thr":$JaccardThr,""" +
        s""""points":[${points.map(_.json).mkString(",")}],""" +
        s""""substring":[${sub.map(_.json).mkString(",")}],""" +
        s""""heavy_hitters":[${hh.map(_.json).mkString(",")}],""" +
        s""""html":[${web.map(_.json).mkString(",")}]""" +
        sweep.map(s => s""","sweep":${s.json}""").getOrElse("") + "}"
    def summary: Option[String] = points.lastOption.map { p =>
      val subTail = sub.lastOption.map(sp =>
        s""","sub_sec":${r3(sp.subSec)},"sub_recall":${r3(sp.recall)}""")
        .getOrElse("")
      val hhTail = hh.lastOption.map(hp =>
        s""","hh_sec":${r3(hp.hhSec)},"hh_ok":${hp.countOk}""")
        .getOrElse("")
      s"""{"n_max":${p.n},"lsh_sec":${r3(p.lshSec)},""" +
        s""""recall_planted":${r3(p.recall)}$subTail$hhTail}"""
    }
  }

  def runPoint(spark: SparkSession, n: Long): Point = {
    import spark.implicits._
    val (docs, genSec) = timeIt {
      val d = corpus(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      d
    }
    // SINGLE measured run (r10 verdict item 3: universal best-of-2
    // outgrew the driver's window) — starved readings are caught by
    // ScaleGuard/drift-guard re-measures, which are themselves gated
    def once(): (DataFrame, Long, Double) = {
      val ((df, c), t) = timeIt(lshPairs(docs))
      (df, c, t)
    }
    val (p1, cand1, t1) = once()
    val found = p1.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    p1.unpersist()
    val planted = (1L until n by 100L).map(id => (id - 1, id)).toSet
    val hit = planted.count { case (a, b) =>
      found.contains((a, b)) || found.contains((b, a))
    }
    docs.unpersist()
    Point(n, genSec, t1, cand1, found.size,
      planted.size, if (planted.isEmpty) 1.0 else hit.toDouble / planted.size,
      lshFirst = t1)
  }

  /** Expected longest shared span of planted pair (id-1, id): the
    * mutation at p splits the stream into spans of p and len-1-p
    * tokens (a span registers only with >= 4 tokens, i.e. one 4-gram;
    * at len >= 40 the larger side is always >= 19, so every planted
    * pair qualifies for the >= 8 report). */
  private[graft] def expectedMaxSpan(id: Long): Long = {
    val base = id - 1
    val len = 40 + (mix(base * 7 + 1) & 0x7fffffff).toInt % 40
    val p = ((mix(id) & 0x7fffffff) % len).toInt
    math.max(if (p >= 4) p else 0, if (len - 1 - p >= 4) len - 1 - p else 0)
  }

  /** q184's operator path (gram-diagonal islands, hot-gram cap 50,
    * min span 8) at generated scale, value-checked: planted-pair
    * recall AND exact agreement of each recovered pair's max_span
    * with the generator-derived expectation. */
  def runSubstringPoint(spark: SparkSession, n: Long): SubPoint = {
    val docs = corpus(spark, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def once(): (Array[(Long, Long, Long)], Double) = {
      val (rows, t) = timeIt {
        DedupOps.substringSpans(docs, cap = 50)
          .groupBy("a_id", "b_id")
          .agg(max("span_len").as("max_span"))
          .filter(col("max_span") >= 8)
          .collect()
          .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
            r.getAs[Long]("max_span")))
      }
      (rows, t)
    }
    val (found, t1) = once() // single run (see runPoint)
    docs.unpersist()
    val byPair = found.map(r => (r._1, r._2) -> r._3).toMap
    val plantedIds = (1L until n by 100L).filter(_ % 100 == 1)
    val hits = plantedIds.count(id => byPair.contains((id - 1, id)))
    val exact = plantedIds.count(id =>
      byPair.get((id - 1, id)).contains(expectedMaxSpan(id)))
    SubPoint(n, t1, found.length,
      plantedIds.size, if (plantedIds.isEmpty) 1.0
        else hits.toDouble / plantedIds.size,
      if (hits == 0) 0.0 else exact.toDouble / hits,
      subFirst = t1)
  }

  /** One size point of the q264 boilerplate-heavy-hitter pipeline
    * (Misra–Gries sketch pass + broadcast exact verify) with its own
    * plant: every doc_id % 10 == 0 gets the 8-token template
    * prepended, so the template's four interior 5-gram shingles hold
    * ≈ 1/560 of the stream — above the 1/800 report threshold and
    * the k=1024 sketch guarantee (1/1025), while boundary shingles
    * dilute over the 4096-token vocabulary to ~1/560/4096 each.
    * Value-checked: exactly 4 shingles found, each at EXACTLY the
    * planted-doc count. */
  final case class HhPoint(n: Long, hhSec: Double, found: Long,
      countOk: Boolean, hhFirst: Double = -1.0) {
    def json: String = {
      val audit =
        if (hhFirst > 1.3 * hhSec && hhFirst - hhSec > 0.5)
          s""","hh_first_sec":${r3(hhFirst)}""" else ""
      s"""{"n":$n,"hh_sec":${r3(hhSec)},"hh_found":$found,""" +
        s""""hh_count_ok":$countOk$audit}"""
    }
  }

  def runHhPoint(spark: SparkSession, n: Long): HhPoint = {
    import graft.operators.TextOps
    val docs = corpus(spark, n)
      .select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(lit(TextOps.BoilerplateTemplate + " "), col("text")))
          .otherwise(col("text")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    def once(): (Array[(String, Long)], Double) = timeIt {
      TextOps.heavyShingles(docs, k = 1024, denom = 800)
        .collect()
        .map(r => (r.getAs[String]("shingle"), r.getAs[Long]("cnt")))
    }
    val (found, t1) = once() // single run (see runPoint)
    docs.unpersist()
    val expected = (n + 9) / 10 // ids 0, 10, 20, …
    val tmpl = TextOps.BoilerplateTemplate.split(" ")
    val want = (0 to 3).map(i => tmpl.slice(i, i + 5).mkString(" "))
      .toSet
    val ok = found.length == 4 &&
      found.map(_._1).toSet == want &&
      found.forall(_._2 == expected)
    HhPoint(n, t1, found.length, ok, hhFirst = t1)
  }

  private[graft] def mergedHh(a: HhPoint, b: HhPoint): HhPoint =
    HhPoint(a.n, math.min(a.hhSec, b.hhSec), a.found,
      a.countOk && b.countOk, hhFirst = math.max(a.hhFirst, a.hhSec))

  /** ScaleGuard merge for LSH points: per-metric minima, recall
    * ANDed conservatively (min), and the flagged first reading kept
    * in `lshFirst` so the json's `lsh_first_sec` audit survives.
    * Candidate/pair counts are deterministic across runs — `a`'s kept. */
  private[graft] def mergedPoint(a: Point, b: Point): Point =
    Point(a.n, math.min(a.genSec, b.genSec), math.min(a.lshSec, b.lshSec),
      a.candidates, a.pairs, a.planted, math.min(a.recall, b.recall),
      lshFirst = math.max(a.lshFirst, a.lshSec))

  /** Same contract for substring points (`sub_first_sec` audit). */
  private[graft] def mergedSub(a: SubPoint, b: SubPoint): SubPoint =
    SubPoint(a.n, math.min(a.subSec, b.subSec), a.pairs, a.planted,
      math.min(a.recall, b.recall), math.min(a.spanExact, b.spanExact),
      subFirst = math.max(a.subFirst, a.subSec))

  def run(spark: SparkSession, sizes: Seq[Long],
      sweepN: Option[Long] = None,
      budget: BenchBudget = BenchBudget.unlimited,
      seed: Option[Result] = None): Result = {
    import BenchBudget.{gatedPoints, gatedGuard}
    // Every point is budget-gated on its small twin's reading (r10
    // verdict item 4: the substring 1M tail — 47–534 s observed — and
    // the 51 s hh 1M point are the suite's biggest timeout hazards;
    // they run only when the twin-predicted cost fits the remaining
    // window, and a skip is recorded in the artifact). The substring
    // margin is wider than the default linear 1.6×: its in-suite
    // readings ran up to 2.2× the quiet-host isolated value.
    // The implied-exponent guard (ScaleGuard) still re-measures a
    // flagged biggest point — itself gated, so a 500 s anomaly can't
    // blow the driver's deadline chasing its own re-measure.
    // measured single-run quiet-host default-size costs, padded
    // (substring's generously: 47–104 s observed at 1M in-suite)
    val pts = gatedGuard(budget, "text_lsh",
      gatedPoints(budget, "text_lsh", sizes, firstEst = 15.0,
        fixedEst = Map(100000L -> 10.0, 1000000L -> 30.0),
        seed = seed.map(_.points).getOrElse(Seq.empty))(
        runPoint(spark, _))(_.n, _.lshSec))(_.n, _.lshSec)(
      runPoint(spark, _), mergedPoint)
    val subs = gatedGuard(budget, "text_sub",
      gatedPoints(budget, "text_sub", sizes, firstEst = 15.0,
        margin = 2.5,
        fixedEst = Map(100000L -> 8.0, 1000000L -> 80.0),
        seed = seed.map(_.sub).getOrElse(Seq.empty))(
        runSubstringPoint(spark, _))(_.n, _.subSec))(
      _.n, _.subSec)(runSubstringPoint(spark, _), mergedSub)
    val hhs = gatedGuard(budget, "text_hh",
      gatedPoints(budget, "text_hh", sizes, firstEst = 15.0,
        margin = 2.0,
        fixedEst = Map(100000L -> 8.0, 1000000L -> 65.0),
        seed = seed.map(_.hh).getOrElse(Seq.empty))(
        runHhPoint(spark, _))(_.n, _.hhSec))(
      _.n, _.hhSec)(runHhPoint(spark, _), mergedHh)
    val webs = gatedGuard(budget, "text_web",
      gatedPoints(budget, "text_web", sizes, firstEst = 10.0,
        fixedEst = Map(100000L -> 4.0, 1000000L -> 9.0),
        seed = seed.map(_.web).getOrElse(Seq.empty))(
        runWebPoint(spark, _))(_.n, _.htmlSec))(_.n, _.htmlSec)(
      runWebPoint(spark, _), mergedWeb)
    val sweep = sweepN.filter(n =>
      budget.fits(s"text_sweep_$n", 30.0)).map(runSweep(spark, _))
    Result(pts, subs, sweep, hhs, webs)
  }
}
