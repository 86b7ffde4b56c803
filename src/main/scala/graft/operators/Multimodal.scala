package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions._

/** Multimodal column plumbing (SURVEY.md §2 m01; the reference's
  * multi-modal/cross-modal query use-cases, README "Use-cases for
  * Compound Queries" and bigvectorbench/datasets.py BVB img/text
  * datasets): opaque binary
  * payloads + typed metadata, batch feature extraction. The real
  * decode (image/audio libs) is STUBBED with a deterministic fake —
  * everything Spark-side (schema, binary columns, partition-balanced
  * batch extraction, fixed-dim feature output) is real and is exactly
  * the plumbing a JPEG/PCM decoder UDF would plug into.
  */
object Multimodal {

  val PatchBytes = 256
  val FeatDim = 8

  /** Build the multimodal table: payload as binary + metadata, then
    * run the (stubbed) batch feature extractor per PatchBytes block.
    * Output keeps the oracle-checkable metadata legs (sizes/checksum)
    * alongside the fake embedding.
    */
  def pipeline(docs: DataFrame): DataFrame = {
    val withPayload = docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").as("content_length"),
        lit("text/plain").as("mime")).as("meta"))
    val extracted = withPayload
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("checksum", byte_sum(col("payload")))
      .withColumn("n_patches", expr(s"(n_bytes + ${PatchBytes - 1}) div $PatchBytes"))
      // deterministic fake "decoder": FeatDim pseudo-features seeded by
      // the checksum — a stand-in with the exact shape a real decoder
      // (mapPartitions over payload bytes) would produce
      .withColumn("features", expr(
        s"transform(sequence(0, ${FeatDim - 1}), " +
          s"j -> cast(pmod(checksum * (j + 1), 997) as double) / 997.0)"))
    extracted.select(
      col("doc_id"), col("meta.origin").as("origin"),
      col("n_bytes"), col("checksum"), col("n_patches"),
      size(col("features")).cast("long").as("feat_dim"))
  }

  val BatchSize = 64
  val FrameStride = 4

  /** m02: frame-sampling batch extraction — the video/audio leg of
    * the pipeline. Payloads are range-partitioned (balanced by key,
    * no hot executors), then mapPartitions processes rows in explicit
    * batches of [[BatchSize]] — the exact batch shape a vectorised
    * decoder (mapInPandas / mapInArrow in PySpark, a JNI codec here)
    * consumes — and emits every [[FrameStride]]-th PatchBytes block
    * ("frame") with its byte length and checksum. The decode is the
    * deterministic stub; every emitted value is per-row deterministic,
    * so the result is partitioning- and batching-independent (and
    * oracle-checkable).
    */
  def frameSample(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val payloads = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .repartitionByRange(col("doc_id"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // a real decoder would hand `batch` to the codec as one
        // vectorised call; the stub walks the same batch structure
        batch.iterator.flatMap { case (id, bytes) =>
          val nPatches = (bytes.length + PatchBytes - 1) / PatchBytes
          (0 until nPatches by FrameStride).map { p =>
            val start = p * PatchBytes
            val end = math.min(start + PatchBytes, bytes.length)
            var acc = 0L
            var i = start
            while (i < end) { acc += bytes(i) & 0xff; i += 1 }
            (id, p.toLong, (end - start).toLong, acc)
          }
        }
      }
    }.toDF("doc_id", "frame_no", "frame_bytes", "frame_checksum")
      .orderBy("doc_id", "frame_no")
  }
}
