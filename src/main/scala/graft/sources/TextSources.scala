package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Non-parquet ingest paths — LLM corpora arrive as JSONL and event
  * logs as CSV far more often than as parquet. Both readers take an
  * EXPLICIT schema: schema inference reads the data twice and infers
  * per-file at scale (a 100 TB anti-pattern); a declared schema makes
  * the scan single-pass and the column types stable across shards.
  * Writers exist to stage test corpora; a real deployment reads what
  * the upstream produced.
  */
object TextSources {

  /** Write a DataFrame as JSON-lines (one object per row — the
    * interchange format of text-corpus pipelines).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a JSONL corpus with a declared schema. Rows that fail to
    * parse surface in `_corrupt_record` under the default PERMISSIVE
    * mode; pass FAILFAST to refuse bad shards instead.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** Write a DataFrame as headered CSV (quoted, so embedded JSON
    * strings survive).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Read a CSV log with a declared schema. */
  def readCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)
}
