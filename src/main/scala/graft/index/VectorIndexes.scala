package graft.index

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.DistanceMetric

/** Vector-index catalog + KNN front door.
  *
  * Mirrors the reference's `Catalog::CreateVectorIndex` metadata
  * (`src/include/catalog/catalog.h:293-350`: index name, table, column,
  * method, distance fn, options) and the optimizer's index selection
  * (`src/optimizer/vector_index_scan.cpp:29-62` MatchVectorIndex):
  *   - session var `vector_index_method` ∈ ivfflat | hnsw | none | unset
  *     (reference `optimizer.cpp:26`), here the Spark conf
  *     `graft.vector_index_method`;
  *   - unset: prefer an index with the matching distance fn, else any
  *     index on the column (the reference's documented quirk, `:52-59`);
  *   - none: always brute-force.
  */
object VectorIndexes {

  sealed trait Model {
    def scan(spark: SparkSession, query: Seq[Double], k: Int): DataFrame
  }
  final case class IvfModel(m: IvfFlatModel, idCol: String) extends Model {
    def scan(spark: SparkSession, query: Seq[Double], k: Int): DataFrame =
      m.scan(query, k, tieBreak = Some(idCol))
  }
  final case class HnswModel(idx: HnswIndex, idCol: String) extends Model {
    def scan(spark: SparkSession, query: Seq[Double], k: Int): DataFrame =
      Hnsw.scanAsDf(spark, idx, query, k)
        .withColumnRenamed("id", idCol)
  }

  final case class IndexMeta(
      name: String, table: String, column: String, method: String,
      metric: DistanceMetric.Value, model: Model)

  private val registry = TrieMap.empty[String, IndexMeta]

  def register(meta: IndexMeta): Unit = registry.put(meta.name, meta)
  def drop(name: String): Unit = registry.remove(name)
  def get(name: String): Option[IndexMeta] = registry.get(name)
  def list(): Seq[IndexMeta] = registry.values.toSeq

  def createIvfFlat(name: String, table: String, df: DataFrame,
      idCol: String, vecCol: String, lists: Int, probeLists: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2): IvfFlatModel = {
    val m = IvfFlat.build(df, Seq(idCol), vecCol, lists, probeLists, metric)
    register(IndexMeta(name, table, vecCol, "ivfflat", metric,
      IvfModel(m, idCol)))
    m
  }

  def createHnsw(name: String, table: String, df: DataFrame,
      idCol: String, vecCol: String, m: Int, efConstruction: Int,
      efSearch: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2): HnswIndex = {
    val idx = Hnsw.build(df, idCol, vecCol, m, efConstruction, efSearch,
      metric)
    register(IndexMeta(name, table, vecCol, "hnsw", metric,
      HnswModel(idx, idCol)))
    idx
  }

  /** Index selection per MatchVectorIndex (see object doc). */
  def select(table: String, column: String,
      metric: DistanceMetric.Value, method: String): Option[IndexMeta] = {
    val candidates = registry.values
      .filter(m => m.table == table && m.column == column).toSeq
      .sortBy(_.name)
    method match {
      case "none" => None
      case "ivfflat" | "hnsw" =>
        candidates.find(m => m.method == method && m.metric == metric)
      case _ => // unset: prefer matching metric, else any (reference :52-59)
        candidates.find(_.metric == metric).orElse(candidates.headOption)
    }
  }

  /** KNN over `df` (registered as `table`): index-served when selection
    * finds one, else brute-force TopN. */
  def knn(spark: SparkSession, table: String, df: DataFrame,
      idCol: String, vecCol: String, query: Seq[Double], k: Int,
      metric: DistanceMetric.Value = DistanceMetric.L2): DataFrame = {
    val method =
      spark.conf.getOption("graft.vector_index_method").getOrElse("")
    select(table, vecCol, metric, method) match {
      case Some(meta) => meta.model.scan(spark, query, k)
      case None =>
        Knn.bruteForce(df, vecCol, query, k, metric, Some(idCol))
    }
  }
}
