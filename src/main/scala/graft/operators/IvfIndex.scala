package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** IVF-FLAT — the Spark-native analog of the reference's
  * milvus-ivfflat / vearch-ivfflat index family (README "Supported
  * Databases"). Build: MLlib KMeans partitions the corpus into nlist
  * cells; centroids (tiny) broadcast everywhere. Search: each query
  * probes its nprobe nearest cells, so the scan touches
  * ~nprobe/nlist of the data.
  *
  * 100 TB shape: persist the assigned table partitioned/bucketed by
  * `cluster` — the probe join then becomes partition pruning and the
  * per-query work is a few cells, not the corpus. KMeans trains on a
  * driver-bounded sample; centroid count stays in the thousands.
  */
object IvfIndex {

  /** Train centroids (k x dim) with a fixed seed. */
  def train(base: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      sampleFraction: Double = 1.0): Array[Array[Double]] = {
    val sample = if (sampleFraction < 1.0)
      base.sample(withReplacement = false, sampleFraction, seed) else base
    val feats = sample.select(array_to_vector(col(vecCol).cast("array<double>"))
      .as("__feat")).cache()
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("__feat")
      .setPredictionCol("__pred").setMaxIter(8)
    val cents = km.fit(feats).clusterCenters.map(_.toArray)
    feats.unpersist()
    cents
  }

  /** Column: distances from `vec` to every centroid (array<double>). */
  private def centroidDists(vec: Column, cents: Array[Array[Double]]): Column = {
    val cb = typedlit(cents.map(_.toSeq).toSeq)
    transform(cb, c => vec_l2sq(vec, c))
  }

  /** Column: index of the nearest centroid (first-min tie-break). */
  def nearestCluster(vec: Column, cents: Array[Array[Double]]): Column = {
    val d = centroidDists(vec, cents)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Assign every row to its cell. */
  def assign(df: DataFrame, vecCol: String,
      cents: Array[Array[Double]]): DataFrame =
    df.withColumn("cluster", nearestCluster(col(vecCol), cents))

  /** Column: the nprobe nearest cluster ids for a query vector. */
  def probeClusters(vec: Column, cents: Array[Array[Double]],
      nprobe: Int): Column = {
    val cb = typedlit(cents.map(_.toSeq).toSeq)
    val withIdx = transform(cb, (c, i) =>
      struct(vec_l2sq(vec, c).as("d"), i.cast("int").as("i")))
    transform(slice(array_sort(withIdx), 1, nprobe), s => s.getField("i"))
  }

  /** IVF search: probe-join + exact distance inside probed cells.
    * assigned: (id, vec, cluster); queries: (query_id, qvec).
    * Returns (query_id, rank, neighbor_id, score).
    */
  def search(
      assigned: DataFrame,
      queries: DataFrame,
      cents: Array[Array[Double]],
      k: Int,
      nprobe: Int,
      metric: VecMetric): DataFrame = {
    val probes = queries
      .withColumn("cluster",
        explode(probeClusters(col("qvec"), cents, nprobe)))
    val scored = assigned
      .join(broadcast(probes), "cluster")
      .select(
        col("query_id"),
        metric.score(col("qvec"), col("vec")).as("score"),
        col("id"))
    KnnSearch.topKOf(scored, k, metric.asc)
  }
}
