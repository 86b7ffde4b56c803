package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch beam search over a prebuilt kNN graph — the Spark-shaped
  * query side of the reference's graph/tree index family (HNSW, SPTAG
  * BKT — README "Supported Databases and Algorithms"; the repo's
  * q25/q27 build that graph, this answers queries against it).
  *
  * A single-query HNSW descent is pointer-chasing and belongs in a
  * serving process; the batch analog answers a whole QUERY SET per
  * round: every query keeps a beam of its best-so-far nodes, each
  * round expands all beams one hop through the edge list, scores the
  * newly reached nodes, and re-selects the beam. All queries share
  * each round's two joins, so the per-round cost is:
  *
  *  - `broadcast(beam) ⋈ edges`: one edge-list scan, beam side is
  *    Q × beam rows (tiny, broadcast) — no shuffle of the graph;
  *  - `base ⋈ broadcast(candidates)`: one vector-table scan scoring
  *    Q × beam × degree candidates.
  *
  * Total work is O(rounds × (|E| + N)) scans independent of Q's
  * distances-to-everything, and per-query results touch only
  * entries + rounds × beam × degree vectors — the graph-index value
  * proposition. Deterministic throughout: fixed entry points (first
  * `entryN` ids), (score, id) tie-breaks, so results replicate in SQL.
  */
object GraphSearch {

  /** base: (id, vec); graph: (id, neighbor_id) directed out-edges;
    * queries: (query_id, qvec). Returns (query_id, rank, neighbor_id,
    * score) — top-k of every node VISITED by the beam walk.
    *
    * `entryBeam` > 0 enables the LAYERED entry (the HNSW coarse-layer
    * descent): the entryN sample rows form layer 1, each query scores
    * that tiny layer and enters the base graph at only its
    * `entryBeam` nearest layer rows — a narrower, better-aimed front
    * than seeding every query with all entryN rows, so the same
    * visited budget buys more rounds of real walking. `entryBeam` = 0
    * keeps the flat behavior (all entryN rows seed the walk).
    */
  def beamSearch(
      base: DataFrame,
      graph: DataFrame,
      queries: DataFrame,
      k: Int,
      beam: Int,
      rounds: Int,
      entryN: Int,
      metric: VecMetric = VecMetric.Euclidean,
      entryBeam: Int = 0): DataFrame =
    beamSearchWithVisited(base, graph, queries, k, beam, rounds, entryN,
      metric, entryBeam)._1

  /** [[beamSearch]] plus the per-query count of nodes the walk scored
    * — the visited-fraction metric a graph index is judged by.
    */
  def beamSearchWithVisited(
      base: DataFrame,
      graph: DataFrame,
      queries: DataFrame,
      k: Int,
      beam: Int,
      rounds: Int,
      entryN: Int,
      metric: VecMetric = VecMetric.Euclidean,
      entryBeam: Int = 0): (DataFrame, DataFrame) = {
    val vecs = base.select(col("id"), col("vec"))
    val edges = graph.select(col("id"), col("neighbor_id"))

    // score a (query_id, id) candidate set: one base scan, candidates
    // broadcast (Q x beam x degree rows — always tiny)
    def score(cand: DataFrame): DataFrame =
      vecs.join(broadcast(cand), "id")
        .join(broadcast(queries), "query_id")
        .select(col("query_id"), col("id"),
          metric.score(col("qvec"), col("vec")).as("score"))

    // layer 1: the first entryN ids in id order (the same rows IVF's
    // sample-init picks as centroids — a fixed, replicable seed set),
    // evaluated for every query
    val entries = vecs.orderBy("id").limit(entryN).select("id")
    val layer = score(entries.crossJoin(queries.select("query_id")))
    var visited = (if (entryBeam > 0)
      KnnSearch.topKOf(layer, entryBeam, metric.asc)
        .select(col("query_id"), col("neighbor_id").as("id"), col("score"))
    else layer).localCheckpoint(true)

    for (_ <- 1 to rounds) {
      // beam = top-`beam` of everything visited so far (scores are
      // static, so this equals the classic beam ∪ new-candidates
      // re-selection), then expand one hop
      val beamIds = KnnSearch.topKOf(visited, beam, metric.asc)
        .select(col("query_id"), col("neighbor_id").as("id"))
      val cand = edges.join(broadcast(beamIds), "id")
        .select(col("query_id"), col("neighbor_id").as("id"))
        .distinct()
      // never re-score a visited node (and never let a duplicate
      // occupy two beam slots)
      val fresh = cand.join(visited.select("query_id", "id"),
        Seq("query_id", "id"), "left_anti")
      visited = visited.unionByName(score(fresh)).localCheckpoint(true)
    }

    // the layer scan scored entryN rows per query regardless of how
    // many seeded the walk — count it in the visited metric honestly
    val visitedCounts = visited.groupBy("query_id")
      .agg(count(lit(1)).as("n_visited"))
      .withColumn("n_visited",
        if (entryBeam > 0) col("n_visited") + lit((entryN - entryBeam).toLong)
        else col("n_visited"))
    (KnnSearch.topKOf(visited, k, metric.asc), visitedCounts)
  }
}
