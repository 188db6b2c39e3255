package graft

import graft.operators.{DedupOps, TextOps}

/** Winnowing fingerprint properties that the hash-valued output can't
  * prove through the SQL oracle. */
class TextSpec extends SparkSpecBase {

  test("near-dup docs share most winnowing fingerprints; random pairs few") {
    val fps = TextOps.winnow(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    def overlap(a: Long, b: Long): Double = {
      val (x, y) = (fps(a), fps(b))
      x.intersect(y).size.toDouble / math.min(x.size, y.size)
    }
    val strong = DedupOps.queries("q45_ngram_jaccard")(spark, sfDir)
      .filter("jaccard >= 0.9").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(strong.nonEmpty)
    val strongMean = strong.map { case (a, b) => overlap(a, b) }.sum /
      strong.length
    val ids = fps.keys.toSeq.sorted
    val rnd = new scala.util.Random(3)
    val randMean = (1 to 300).map { _ =>
      overlap(ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length)))
    }.sum / 300.0
    assert(strongMean >= 0.5, s"strongMean=$strongMean")
    assert(strongMean > 2 * randMean,
      s"strongMean=$strongMean randMean=$randMean")
  }

  test("every doc with >= 4 tokens gets fingerprints, bounded by grams") {
    import org.apache.spark.sql.functions._
    val nDocs = Tables.load(spark, sfDir, "documents")
      .filter(size(split(lower(trim(col("text"))), "\\s+")) >= 4).count()
    val perDoc = TextOps.winnow(spark, sfDir)
      .groupBy("doc_id").count().collect()
    assert(perDoc.length == nDocs)
    assert(perDoc.forall(_.getLong(1) >= 1))
  }
}
