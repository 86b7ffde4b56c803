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
    // one ranked list per field
    val perField = fields.map { case (bCol, qCol) =>
      val scored = base.crossJoin(broadcast(queries))
        .select(
          col(qidCol).as("query_id"),
          vec_cosine_sim(col(qCol), col(bCol)).as("score"),
          col(idCol).as("id"))
      KnnSearch.topKOf(scored, perFieldK, asc = false)
    }
    fuseRrf(perField, k, rrfK)
  }

  /** WeightedRanker fusion over per-field CANDIDATE lists — the
    * reference's ACTIVE multi-vector ranker
    * (/root/reference/bigvectorbench/algorithms/milvus/module.py:439
    * runs WeightedRanker(0.25, 0.25, 0.25, 0.25); the RRFRanker line
    * sits commented out beside it at :438). Each frame carries
    * (query_id, neighbor_id, score) with score = that field's cosine
    * similarity (e.g. [[IvfIndex.search]] per field);
    * fused(d) = sum_i w_i * sim_i(d), a field contributing 0 where d
    * missed its list — the served-index semantics; with full
    * per-field lists this degenerates to exactly [[weighted]] (the
    * spec gate). Similarities pivot into fixed columns so the fused
    * sum keeps ONE evaluation order (double addition is not
    * associative — the oracle reproduces bit-identical scores).
    * Fusion touches fields x Q x perFieldK rows, independent of base
    * size.
    */
  def fuseWeighted(perField: Seq[DataFrame], k: Int,
      weights: Seq[Double]): DataFrame = {
    require(weights.length == perField.length)
    val tagged = perField.zipWithIndex.map { case (df, i) =>
      df.select(col("query_id"), col("neighbor_id"), col("score"),
        lit(i).as("field"))
    }.reduceLeft(_ unionAll _)
    val simCols = perField.indices.map(i =>
      max(when(col("field") === i, col("score"))).as(s"s$i"))
    val pivoted = tagged.groupBy("query_id", "neighbor_id")
      .agg(simCols.head, simCols.tail: _*)
    val fused = perField.indices.map(i =>
      coalesce(col(s"s$i"), lit(0.0)) * lit(weights(i)))
      .reduceLeft(_ + _)
    val scored = pivoted.select(
      col("query_id"), fused.as("score"), col("neighbor_id").as("id"))
    KnnSearch.topKOf(scored, k, asc = false)
  }

  /** RRF-fuse per-field rank lists — each frame carries (query_id,
    * neighbor_id, rank), e.g. from [[KnnSearch.topKOf]] over a brute
    * scan (q07) or from an IVF probe per field (q49). Ranks pivot
    * into fixed columns so the fused sum has a fixed evaluation order
    * (double addition is not associative); fields contribute only
    * where the doc made that field's list. The fusion touches only
    * fields x Q x perFieldK rank rows regardless of base size.
    */
  def fuseRrf(perField: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    val tagged = perField.zipWithIndex.map { case (df, i) =>
      df.select(col("query_id"), col("neighbor_id"), col("rank"),
        lit(i).as("field"))
    }.reduceLeft(_ unionAll _)
    val rankCols = (0 until perField.size).map(i =>
      max(when(col("field") === i, col("rank"))).as(s"r$i"))
    val pivoted = tagged.groupBy("query_id", "neighbor_id")
      .agg(rankCols.head, rankCols.tail: _*)
    val fused = (0 until perField.size).map { i =>
      when(col(s"r$i").isNotNull, lit(1.0) / (lit(rrfK) + col(s"r$i")))
        .otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    val scored = pivoted.select(
      col("query_id"), fused.as("score"), col("neighbor_id").as("id"))
    KnnSearch.topKOf(scored, k, asc = false)
  }
}
