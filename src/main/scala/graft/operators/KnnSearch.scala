package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Distance metric surface of the reference
  * (/root/reference/bigvectorbench/distance.py:32-47).
  * `score` is what we rank by; `asc=true` means smaller is better.
  */
sealed trait VecMetric {
  def score(q: Column, v: Column): Column
  def asc: Boolean
}
object VecMetric {
  case object Euclidean extends VecMetric {
    def score(q: Column, v: Column): Column = vec_l2(q, v)
    val asc = true
  }
  /** rank by cosine similarity descending == angular distance ascending */
  case object Cosine extends VecMetric {
    def score(q: Column, v: Column): Column = vec_cosine_sim(q, v)
    val asc = false
  }
  case object InnerProduct extends VecMetric {
    def score(q: Column, v: Column): Column = vec_dot(q, v)
    val asc = false
  }
  case object SignHamming extends VecMetric {
    def score(q: Column, v: Column): Column =
      vec_sign_hamming(q, v).cast("double")
    val asc = true
  }
}

/** Exact batch kNN, the Spark-shaped `BaseANN.query`/`batch_query`
  * (/root/reference/bigvectorbench/algorithms/base/module.py:88-127).
  *
  * Plan shape (the 100 TB story): the query batch is broadcast, the
  * base table streams through a BroadcastNestedLoopJoin into a
  * codegen'd distance expression, and CollectTopK partial-aggregates
  * per partition — one full scan, no N x Q shuffle, no sort.
  */
object KnnSearch {

  /** base: (id, vec, ...), queries: (query_id, qvec).
    * Returns (query_id, rank, neighbor_id, score), rank 1 = best.
    */
  def bruteForce(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      metric: VecMetric,
      idCol: String = "id",
      vecCol: String = "vec",
      qidCol: String = "query_id",
      qvecCol: String = "qvec",
      preFilter: Option[Column] = None): DataFrame = {
    val filtered = preFilter.map(base.filter).getOrElse(base)
    val scored = filtered
      .crossJoin(broadcast(queries))
      .select(
        col(qidCol).as("query_id"),
        metric.score(col(qvecCol), col(vecCol)).as("score"),
        col(idCol).as("id"))
    topKOf(scored, k, metric.asc)
  }

  /** (query_id, score, id) -> ranked top-k per query. */
  def topKOf(scored: DataFrame, k: Int, asc: Boolean): DataFrame =
    scored.groupBy("query_id")
      .agg(collect_topk(col("score"), col("id"), k, asc).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(
        col("query_id"),
        (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"),
        col("col.score").as("score"))

  /** Range query: every base row within `radius` of each query
    * (ascending metrics) — the ε-neighborhood variant.
    */
  def rangeSearch(
      base: DataFrame,
      queries: DataFrame,
      radius: Double,
      metric: VecMetric,
      idCol: String = "id",
      vecCol: String = "vec",
      qidCol: String = "query_id",
      qvecCol: String = "qvec"): DataFrame = {
    require(metric.asc, "rangeSearch expects a distance (ascending) metric")
    base.crossJoin(broadcast(queries))
      .select(
        col(qidCol).as("query_id"),
        metric.score(col(qvecCol), col(vecCol)).as("score"),
        col(idCol).as("neighbor_id"))
      .filter(col("score") <= radius)
  }
}
