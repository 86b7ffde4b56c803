package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Hybrid multi-vector search — the reference's
  * `prepare_multi_vector_query`/`run_multi_vector_query`
  * (/root/reference/bigvectorbench/algorithms/milvus/module.py:422-458):
  * an entity carries several vector fields, per-field similarities are
  * fused into one ranking by WeightedRanker or RRFRanker.
  *
  * Determinism note: fused scores are computed in *fixed field order*
  * on both engines (no commutative re-association of double sums), so
  * the oracle reproduces bit-identical scores.
  */
object MultiVectorSearch {

  /** WeightedRanker: score = sum_i w_i * cosine_sim(q_i, v_i),
    * evaluated left-to-right in field order. `fields` maps base-side
    * and query-side vector columns to a weight.
    */
  def weighted(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      fields: Seq[(String, String, Double)],
      idCol: String = "id",
      qidCol: String = "query_id"): DataFrame = {
    val score = fields.map { case (bCol, qCol, w) =>
      vec_cosine_sim(col(qCol), col(bCol)) * lit(w)
    }.reduceLeft(_ + _)
    val scored = base.crossJoin(broadcast(queries))
      .select(col(qidCol).as("query_id"), score.as("score"), col(idCol).as("id"))
    KnnSearch.topKOf(scored, k, asc = false)
  }

  /** RRFRanker over per-field top-`perFieldK` candidate lists:
    * score(d) = sum_i 1/(rrfK + rank_i(d)), fields contributing only
    * where d is in that field's top-perFieldK (the standard hybrid-
    * search formulation; a full per-field ranking would be an N x Q
    * sort at scale for no recall gain).
    */
  def rrf(
      base: DataFrame,
      queries: DataFrame,
      k: Int,
      fields: Seq[(String, String)],
      perFieldK: Int = 100,
      rrfK: Int = 60,
      idCol: String = "id",
      qidCol: String = "query_id"): DataFrame = {
    // one ranked list per field, tagged by field index
    val perField = fields.zipWithIndex.map { case ((bCol, qCol), i) =>
      val scored = base.crossJoin(broadcast(queries))
        .select(
          col(qidCol).as("query_id"),
          vec_cosine_sim(col(qCol), col(bCol)).as("score"),
          col(idCol).as("id"))
      KnnSearch.topKOf(scored, perFieldK, asc = false)
        .select(col("query_id"), col("neighbor_id"), col("rank"), lit(i).as("field"))
    }.reduceLeft(_ unionAll _)
    // pivot ranks into fixed columns so the fused sum has a fixed
    // evaluation order (double addition is not associative)
    val rankCols = (0 until fields.size).map(i =>
      max(when(col("field") === i, col("rank"))).as(s"r$i"))
    val pivoted = perField.groupBy("query_id", "neighbor_id")
      .agg(rankCols.head, rankCols.tail: _*)
    val fused = (0 until fields.size).map { i =>
      when(col(s"r$i").isNotNull, lit(1.0) / (lit(rrfK) + col(s"r$i")))
        .otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    val scored = pivoted.select(
      col("query_id"), fused.as("score"), col("neighbor_id").as("id"))
    KnnSearch.topKOf(scored, k, asc = false)
  }
}
