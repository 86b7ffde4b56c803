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
}
