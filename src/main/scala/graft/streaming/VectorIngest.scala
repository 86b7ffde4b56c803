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
    val schema = spark.read.parquet(s"$sfDir/embeddings.parquet").schema
    val idxPath = Files.createTempDirectory("graft_stream_ivf").toString
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(sfDir)
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
    idxPath
  }
}
