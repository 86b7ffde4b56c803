package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.EmbeddingGen

/** Embedding-generation suite (SURVEY.md §2 e01-e03): the batch
  * embed-then-index leg of the reference workflow.
  */
object EmbeddingQueries {

  /** e01: hashed TF-IDF document embeddings. Murmur3-hashed feature
    * index isn't SQL-replicable -> rows-only + EmbeddingSpec.
    */
  def embedTfidf(s: SparkSession, dir: String): DataFrame =
    EmbeddingGen.tfidf(Tables.documents(s, dir))
      .select(col("doc_id"), size(col("embedding")).cast("long").as("dim"),
        col("embedding"))
      .orderBy("doc_id")

  /** e02: exact unit normalization of the embeddings table — formula
    * pinned to x / sqrt(dot(v,v)) on both engines.
    */
  def normalizeVecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        EmbeddingGen.normalize(col("embedding")).as("unit_vec"))
      .orderBy("vec_id")

  /** e03: end-to-end embed -> flat index -> cosine top-k. */
  def embedSearch(s: SparkSession, dir: String): DataFrame =
    EmbeddingGen.embedAndSearch(Tables.documents(s, dir), nq = 5, k = 10)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
      .orderBy("query_id", "rank")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_embed_tfidf" -> (embedTfidf _),
    "e02_normalize" -> (normalizeVecs _),
    "e03_embed_search" -> (embedSearch _)
  )

  val oracleSql: Map[String, String] = Map(
    "e02_normalize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT vec_id,
        |       list_transform(v, x -> x / sqrt(list_inner_product(v, v)))
        |         AS unit_vec
        |FROM e ORDER BY vec_id""".stripMargin
  )
}
