package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Grouping search — the "top-k distinct groups" ANN surface (the
  * Milvus grouping_search API family, and the dedup-aware retrieval
  * shape a training-data pipeline wants: one champion per near-dup
  * cluster / source / domain instead of k copies of the same thing).
  *
  * Per query: rank GROUPS by their best-scoring member, return the
  * top-g groups with each group's champion row.
  *
  * Plan shape (the 100 TB story): the scored scan is the same
  * broadcast-queries x base stream as [[KnnSearch.bruteForce]]; the
  * per-(query, group) champion is ONE hash aggregate whose map-side
  * partials bound the shuffle at O(parts x Q x G) rows regardless of
  * N; the final ranking window runs over Q x G rows — bounded by
  * contract, because the group column is low-cardinality categorical
  * (labels, sources, cluster ids). No sort or window ever touches an
  * O(N) frame.
  */
object GroupedSearch {

  /** base: (id, vec, <groupCol>, ...), queries: (query_id, qvec).
    * Returns (query_id, rank, grp, neighbor_id): the top-`g` groups
    * per query ranked by champion score (ties by group key), each
    * with its champion member (ties by id).
    *
    * Works for ascending and descending metrics: scores are ranked on
    * `rs` = score negated for descending metrics, so the lexicographic
    * struct-min is always "best member first". Distances are
    * non-negative here, so the negation cannot manufacture a -0.0 /
    * +0.0 ordering difference vs the oracle.
    */
  def search(
      base: DataFrame,
      queries: DataFrame,
      g: Int,
      metric: VecMetric,
      groupCol: String,
      idCol: String = "id",
      vecCol: String = "vec",
      qidCol: String = "query_id",
      qvecCol: String = "qvec"): DataFrame = {
    val raw = metric.score(col(qvecCol), col(vecCol))
    val rs = if (metric.asc) raw else negate(raw)
    val scored = base.crossJoin(broadcast(queries))
      .select(col(qidCol).as("query_id"), rs.as("rs"),
        col(groupCol).as("grp"), col(idCol).as("id"))
    championsOf(scored, g)
  }

  /** (query_id, rs, grp, id) scored candidates -> the top-`g` groups
    * per query. rs must already be ascending-is-better. The champion
    * per (query, group) is a lexicographic struct-min == argmin by
    * (score, id) — a partial-aggregable reduce, not a window; the
    * ranking window then only sees Q x G rows (bounded by contract:
    * the group column is low-cardinality categorical).
    */
  def championsOf(scored: DataFrame, g: Int): DataFrame = {
    // min(struct(..)) deliberately, NOT collect_topk(k=1): the key
    // space here is (query x group) — orders of magnitude wider than
    // topKOf's (query) — and TypedImperativeAggregate rides
    // ObjectHashAggregate, which falls back to SORT-based aggregation
    // past ~128 distinct keys per partition (measured 36.6 s vs this
    // plan's 23.8 s on a 100M-pair, 100k-key scan). The struct-min
    // buffer is fixed-width, so it stays in codegen'd HashAggregate
    // at any key cardinality.
    val champ = scored.groupBy("query_id", "grp")
      .agg(min(struct(col("rs"), col("id"))).as("c"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("c.rs"), col("grp"))
    champ.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= g)
      .select(col("query_id"), col("rank"), col("grp"),
        col("c.id").as("neighbor_id"))
  }
}
