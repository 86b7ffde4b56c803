package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.IvfIndex

/** Streaming ingest INTO a vector index — the reference's continuous
  * insert path (base/module.py insert) as Structured Streaming: each
  * micro-batch of vectors is assigned to the FIXED centroids (one
  * O(batch) broadcast-argmin projection, no rebuild, same as q28) and
  * appended to the cluster-partitioned on-disk layout that
  * partition-pruned search reads (q26). The final index content is
  * batching-independent: assignment is per-row deterministic and the
  * layout is append-only, so 1 or 1000 micro-batches land the same
  * rows in the same cell directories — which is what makes the
  * streaming path oracle-gateable.
  */
object VectorIngest {

  /** Run the ingest stream to completion (AvailableNow over the
    * dataset's embeddings file) and return the index path.
    */
  def streamIndexIngest(spark: SparkSession, sfDir: String,
      cents: Array[Array[Double]]): String = {
    val schema = graft.Tables.schemaAt(spark, s"$sfDir/embeddings.parquet")
    val idxPath = Files.createTempDirectory("graft_stream_ivf").toString
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(sfDir)
      // index the train split only (graft.queries.Split): the test
      // rows are the held-out query workload, never ingested
      .filter(graft.queries.Split.isTrain(col("vec_id")))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfIndex.assign(batch, "vec", cents)
          .write.mode("append").partitionBy("cluster").parquet(idxPath)
        ()
      }
      .option("checkpointLocation", s"${idxPath}_chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Checkpoints.deleteRecursively(s"${idxPath}_chk")
    // post-ingest housekeeping: collapse any cell the micro-batch
    // appends fragmented (content-preserving, so the q35 gate is
    // unaffected)
    compactIndex(spark, idxPath)
    idxPath
  }

  /** Compact the over-fragmented cells of a cluster-partitioned
    * layout. Streaming ingest appends one file per (micro-batch x
    * touched cell), so the layout degrades toward thousands of tiny
    * files whose per-file open/footer cost eventually dominates a
    * pruned search. Any cell holding more than `maxFilesPerCell`
    * parquet files is rewritten as ONE file; untouched cells keep
    * their files byte-identical (dynamic partition overwrite — the
    * same surgical idiom as IvfIndex.upsertPersisted). Content is
    * unchanged, so a post-compaction search is oracle-identical.
    * Returns the number of cells compacted.
    */
  def compactIndex(spark: SparkSession, idxPath: String,
      maxFilesPerCell: Int = 4): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    val base = new org.apache.hadoop.fs.Path(idxPath)
    val frag = fs.listStatus(base).filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("cluster="))
      .filter(d => fs.listStatus(d)
        .count(_.getPath.getName.endsWith(".parquet")) > maxFilesPerCell)
      .map(_.getName.stripPrefix("cluster=").toInt)
      .toSeq
    if (frag.nonEmpty) {
      // repartition ON the partition column: each fragmented cell's
      // rows land in exactly one task, so the rewrite emits exactly
      // one file per cell. Materialise before overwriting the path
      // the plan reads from.
      val compacted = spark.read.parquet(idxPath)
        .filter(col("cluster").isin(frag: _*))
        .repartition(math.min(frag.length, 32), col("cluster"))
        .localCheckpoint(true)
      compacted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cluster").parquet(idxPath)
    }
    frag.length
  }
}
