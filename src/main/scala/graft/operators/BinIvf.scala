package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Binary IVF — the reference's BIN_IVF_FLAT index family (milvus
  * binary indexes served on the hamming/bitstring datasets,
  * datasets.py:343, 622): the IVF shape of IvfIndex, but everything —
  * centroids, assignment, probes, final ranking — runs on PACKED bit
  * vectors (array<long> words) with XOR+popcount hamming. Per-row
  * index payload is dims/8 bytes and every distance is a handful of
  * ALU ops, so at 100 TB the scan is ~64x cheaper than the float
  * equivalent while keeping the same partition-prunable cell layout.
  */
object BinIvf {

  /** Deterministic sample-init centroids: the k packed vectors with
    * smallest id (ORDER BY id LIMIT k in the oracle — same contract
    * as IvfIndex.sampleCentroids).
    */
  def sampleCentroids(base: DataFrame, vecCol: String, k: Int,
      idCol: String = "id"): Array[Array[Long]] =
    base.orderBy(idCol).limit(k)
      .select(col(vecCol))
      .collect().map(_.getSeq[Long](0).toArray)

  private def centroidDists(vec: Column, cents: Array[Array[Long]]): Column = {
    val cb = typedlit(cents.map(_.toSeq).toSeq)
    transform(cb, c => packed_hamming(vec, c))
  }

  /** Nearest centroid by hamming, first-min tie-break (== the
    * oracle's ORDER BY distance, cluster — hamming ties are common,
    * so the tie rule is load-bearing for parity).
    */
  def nearestCluster(vec: Column, cents: Array[Array[Long]]): Column = {
    val d = centroidDists(vec, cents)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  def assign(df: DataFrame, vecCol: String,
      cents: Array[Array[Long]]): DataFrame =
    df.withColumn("cluster", nearestCluster(col(vecCol), cents))

  /** Each query's nprobe nearest cells by hamming; (dist, cluster)
    * tie-break via collect_topk's id ordering.
    */
  def probes(queries: DataFrame, cents: Array[Array[Long]],
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid")
    val scored = queries.crossJoin(broadcast(centsDf))
      .select(col("query_id"),
        packed_hamming(col("qvec"), col("centroid")).cast("double").as("score"),
        col("cluster").cast("long").as("id"))
    KnnSearch.topKOf(scored, nprobe, asc = true)
      .select(col("query_id"), col("neighbor_id").cast("int").as("cluster"))
  }

  /** Probe-join search: exact hamming inside probed cells only. */
  def search(
      assigned: DataFrame, // (id, vec: array<long>, cluster)
      queries: DataFrame, // (query_id, qvec: array<long>)
      cents: Array[Array[Long]],
      k: Int,
      nprobe: Int): DataFrame = {
    val probed = probes(queries, cents, nprobe)
      .join(queries, "query_id")
      .localCheckpoint(true)
    val scored = assigned
      .join(broadcast(probed), "cluster")
      .select(col("query_id"),
        packed_hamming(col("qvec"), col("vec")).cast("double").as("score"),
        col("id"))
    KnnSearch.topKOf(scored, k, asc = true)
  }
}
