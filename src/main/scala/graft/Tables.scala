package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  * Column-pruned, filter-pushed parquet scans — always project before
  * wide ops so the scan's ReadSchema stays narrow.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
