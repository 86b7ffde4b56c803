package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-file ingest — the reference's datasets ultimately come from
  * real files on disk (bigvectorbench/datasets.py downloads and reads
  * dataset files); multimodal corpora in particular arrive as
  * directories of image/audio files, not as rows. Spark's binaryFile
  * source is the scale path: each file becomes a (path,
  * modificationTime, length, content) row, the listing is
  * distributed, and pathGlobFilter prunes non-matching files at
  * listing time (never read). HDF5 itself is a declared NON-GOAL in
  * this container: no h5py exists here to produce a reference file
  * and there is no egress to fetch one, so a from-scratch HDF5 parser
  * could only be validated against itself; the ingest contract it
  * would serve is covered by this binaryFile path plus the
  * parquet/ORC/CSV/JSONL readers (SURVEY.md §2 sources).
  */
object BinarySources {

  /** Stage one REAL image file per doc (the test corpus's stand-in
    * for an image directory) — distributed write, one file per row.
    */
  def writeImageFiles(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    new java.io.File(path).mkdirs()
    docs.select(col("doc_id")).as[Long].foreachPartition {
      (it: Iterator[Long]) =>
        it.foreach { id =>
          java.nio.file.Files.write(
            new java.io.File(path, f"img_$id%06d.png").toPath,
            graft.operators.Multimodal.syntheticPng(id))
        }
    }
  }

  /** Read an image directory through binaryFile: glob-pruned listing,
    * key parsed from the file path, payload as a binary column ready
    * for the batched decode operators.
    */
  def readImageDir(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(path)
      .select(
        regexp_extract(col("path"), "img_(\\d+)\\.png$", 1)
          .cast("long").as("doc_id"),
        col("content").as("img_payload"))
}
