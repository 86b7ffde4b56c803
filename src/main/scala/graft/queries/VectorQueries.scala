package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{KnnSearch, VecMetric}

/** Core ANN query suite (SURVEY.md §2) with DuckDB oracle parity:
  * ids/ranks only in gated outputs (integer-exact), ordering ties
  * broken by id on both engines.
  */
object VectorQueries {
  val K = 10
  val NQ = 10

  private def baseAndQueries(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(s, dir)
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    (base, queries)
  }

  private def ranked(df: DataFrame): DataFrame =
    df.select(
      col("query_id"),
      col("rank").cast("long").as("rank"),
      col("neighbor_id"))
      .orderBy("query_id", "rank")

  def knn(metric: VecMetric)(s: SparkSession, dir: String): DataFrame = {
    val (base, queries) = baseAndQueries(s, dir)
    ranked(KnnSearch.bruteForce(base, queries, K, metric))
  }

  /** Oracle template shared by the exact knn variants. */
  private def knnSql(orderExpr: String): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |           FROM embeddings WHERE vec_id < $NQ),
       |     b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
       |SELECT query_id, rank, neighbor_id FROM (
       |  SELECT q.query_id, b.id AS neighbor_id,
       |         row_number() OVER (PARTITION BY q.query_id
       |                            ORDER BY $orderExpr, b.id) AS rank
       |  FROM q CROSS JOIN b)
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_knn_euclidean" -> knn(VecMetric.Euclidean) _,
    "q02_knn_cosine" -> knn(VecMetric.Cosine) _,
    "q03_knn_dot" -> knn(VecMetric.InnerProduct) _,
    "q08_knn_hamming" -> knn(VecMetric.SignHamming) _
  )

  val oracleSql: Map[String, String] = Map(
    "q01_knn_euclidean" -> knnSql("list_distance(q.qv, b.v)"),
    "q02_knn_cosine" -> knnSql("list_cosine_similarity(q.qv, b.v) DESC"),
    "q03_knn_dot" -> knnSql("list_inner_product(q.qv, b.v) DESC"),
    "q08_knn_hamming" -> knnSql(
      "len(list_filter(list_zip(q.qv, b.v), p -> (p[1] > 0) != (p[2] > 0)))")
  )
}
