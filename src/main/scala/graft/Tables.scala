package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  * Column-pruned, filter-pushed parquet scans — always project before
  * wide ops so the scan's ReadSchema stays narrow.
  *
  * Schema memo: a bare `spark.read.parquet(path)` infers the schema by
  * reading parquet footers in a one-task Spark job on EVERY call —
  * ~0.2 s of pure fixed cost per table reference at local[32]
  * (ProfQuery: "parquet at Tables.scala" preceding every query's real
  * jobs). The footer schema of a static dataset is metadata, so it is
  * inferred once per (session, path) and passed explicitly afterwards;
  * the scan itself (and everything the oracle hashes) is unchanged.
  * Keyed by session too: tests tear sessions down, and a schema bound
  * to a stopped session's conf must not leak into the next one.
  */
object Tables {
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), StructType]

  /** Memoized footer schema of a static parquet path (file or dir).
    * Only for paths whose schema is fixed for the session lifetime —
    * the testdata tables and the written-once index/temp paths.
    */
  def schemaAt(spark: SparkSession, path: String): StructType =
    schemaCache.getOrElseUpdate((spark, path),
      spark.read.parquet(path).schema)

  /** Parquet scan of a static path with the memoized schema — same
    * plan as `spark.read.parquet(path)` minus the per-call footer
    * inference job.
    */
  def parquetAt(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schemaAt(spark, path)).parquet(path)

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    parquetAt(spark, s"$dir/$name.parquet")

  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
}
