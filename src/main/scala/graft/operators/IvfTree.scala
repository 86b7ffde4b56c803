package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions._

/** Two-level IVF tree — the Spark-native analog of the reference's
  * tree-partitioned index family (SPTAG BKT / SCANN's coarse-then-
  * fine quantization; README "Supported Databases and Algorithms").
  * A flat IVF needs nlist ~ sqrt(N) cells for balanced scan cost, and
  * at 100 TB that is a million-centroid argmin in every assignment;
  * a tree keeps each level's fanout small (the assignment argmin is
  * fanout-sized, the model a driver-trivial fanout^2 table) while the
  * leaf count — and so the pruning ratio — is their product.
  *
  * Build: level-1 centroids partition the corpus; within each L1
  * cell, level-2 sub-centroids partition the cell. Both levels are
  * deterministic sample-init (first ids in id order — faiss-style
  * reproducible sampling, DuckDB-replicable) like IvfIndex; both
  * assignments are pure column projections against broadcast
  * centroid literals — no shuffle in the build beyond the write.
  *
  * Search descends: rank L1 cells by query distance, keep p1; rank
  * the surviving cells' sub-centroids, keep p2 leaves; scan only
  * those leaves. The scanned fraction is ~(p2 / (l1 * sub)) with
  * two fanout-sized rankings as the only overhead per query.
  */
object IvfTree {

  /** sub(i) = sub-centroids of L1 cell i, indexed by rank-by-id
    * within the cell (ragged: a small cell may have fewer than
    * `sub` members).
    */
  final case class Model(l1: Array[Array[Double]],
      sub: Array[Array[Array[Double]]])

  /** Deterministic sample-init build: L1 = first `l1` vectors by id;
    * each cell's sub-centroids = its first `sub` member vectors by id.
    * The collected model is l1 x sub vectors — tiny by construction.
    */
  def sampleModel(base: DataFrame, vecCol: String, l1: Int, sub: Int,
      idCol: String = "id"): Model = {
    val l1Cents = IvfIndex.sampleCentroids(base, vecCol, l1, idCol)
    val w = Window.partitionBy("l1").orderBy(idCol)
    val subRows = IvfIndex.assign(base, vecCol, l1Cents)
      .withColumnRenamed("cluster", "l1")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= sub)
      .select(col("l1"), col("rn"),
        col(vecCol).cast("array<double>").as("cv"))
      .collect()
    val subCents = Array.tabulate(l1) { c =>
      val members = subRows.filter(_.getInt(0) == c).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray)
      // An L1 cell can end up with zero members when duplicate vectors
      // appear among the sampled centroids (ties all assign to the
      // first duplicate). Repair at build time by seeding the cell
      // with its own L1 centroid — a valid single-leaf cell — rather
      // than handing assign() a model it must reject.
      if (members.nonEmpty) members else Array(l1Cents(c).clone())
    }
    Model(l1Cents, subCents)
  }

  /** Column: argmin sub-cell within the row's own L1 cell — a pure
    * projection against the (fanout^2-sized) broadcast literal, no
    * shuffle, first-min tie-break = lowest l2 rank.
    */
  private def nearestSub(vec: Column, l1Col: Column, m: Model): Column = {
    val subLit = typedlit(m.sub.map(_.map(_.toSeq).toSeq).toSeq)
    val d = transform(element_at(subLit, l1Col + 1), c => vec_l2(vec, c))
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Assign every row to its (l1, l2) leaf. An empty L1 cell would
    * make nearestSub's array_min null and silently drop its rows from
    * any later probe join — refuse such a model up front instead.
    */
  def assign(df: DataFrame, vecCol: String, m: Model): DataFrame = {
    val empty = m.sub.zipWithIndex.collect { case (cs, i) if cs.isEmpty => i }
    require(empty.isEmpty,
      s"IvfTree model has empty L1 cells ${empty.mkString(",")}: " +
        "out-of-sample rows assigned there would vanish from probes")
    val a1 = IvfIndex.assign(df, vecCol, m.l1)
      .withColumnRenamed("cluster", "l1")
    a1.withColumn("l2", nearestSub(col(vecCol), col("l1"), m))
  }

  /** Per-query probe leaves: top-p1 L1 cells by centroid distance,
    * then top-p2 of their sub-centroids, ties (dist, l1, l2).
    */
  def probes(queries: DataFrame, m: Model, p1: Int, p2: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val maxSub = m.sub.map(_.length).max.max(1)
    val l1Df = m.l1.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("l1", "cv")
    val subDf = m.sub.zipWithIndex.flatMap { case (cs, i) =>
      cs.zipWithIndex.map { case (c, j) => (i, j, c.toSeq) }
    }.toSeq.toDF("l1", "l2", "cv")
    val top1 = KnnSearch.topKOf(
      queries.crossJoin(broadcast(l1Df))
        .select(col("query_id"), vec_l2(col("qvec"), col("cv")).as("score"),
          col("l1").cast("long").as("id")),
      p1, asc = true)
      .select(col("query_id"), col("neighbor_id").cast("int").as("l1"))
    // encode (l1, l2) as one id so the top-k tie-break is (dist, l1, l2)
    val top2 = KnnSearch.topKOf(
      top1.join(broadcast(subDf), "l1")
        .join(queries, "query_id")
        .select(col("query_id"), vec_l2(col("qvec"), col("cv")).as("score"),
          (col("l1") * maxSub + col("l2")).cast("long").as("id")),
      p2, asc = true)
    top2.select(col("query_id"),
      (col("neighbor_id") / maxSub).cast("int").as("l1"),
      (col("neighbor_id") % maxSub).cast("int").as("l2"))
  }

  /** Tree search: probe worklist (Q x p2 leaves, broadcast) joined
    * against the leaf-assigned table, exact top-k inside the probed
    * leaves.
    */
  def search(assigned: DataFrame, queries: DataFrame, m: Model,
      k: Int, p1: Int, p2: Int, metric: VecMetric): DataFrame = {
    val probed = probes(queries, m, p1, p2)
      .join(queries, "query_id")
      .localCheckpoint(true)
    val scored = assigned
      .join(broadcast(probed), Seq("l1", "l2"))
      .select(col("query_id"),
        metric.score(col("qvec"), col("vec")).as("score"),
        col("id"))
    KnnSearch.topKOf(scored, k, metric.asc)
  }
}
