package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HybridFusionSpec extends AnyFunSuite {
  import TestSpark._

  /** The in-plan fusion q41 shipped with before round 18 — the
    * reference implementation the driver-side twin must reproduce
    * bit-for-bit (same union/left-join/RRF-score/window semantics).
    */
  private def fuseInPlan(bm: DataFrame, cs: DataFrame): DataFrame = {
    val ids = bm.select("query_id", "neighbor_id")
      .unionByName(cs.select("query_id", "neighbor_id")).distinct()
    val sc = ids
      .join(bm, Seq("query_id", "neighbor_id"), "left")
      .join(cs, Seq("query_id", "neighbor_id"), "left")
      .withColumn("score",
        coalesce(lit(1.0) / (lit(60) + col("r_bm")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_cs")), lit(0.0)))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    sc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= graft.queries.TextQueries.HybridK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  test("driver-side RRF fusion is bit-identical to the in-plan fusion") {
    import spark.implicits._
    // overlap, leg-disjoint ids, rank ties across legs (ids 20/21 at
    // symmetric ranks -> equal fused scores, broken by neighbor_id),
    // and a query present in only one leg
    val bm = Seq(
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 21L), (1L, 4L, 30L),
      (1L, 5L, 40L), (1L, 6L, 50L), (1L, 7L, 60L),
      (2L, 1L, 11L), (2L, 2L, 12L),
      (3L, 1L, 99L)
    ).toDF("query_id", "r_bm", "neighbor_id")
    val cs = Seq(
      (1L, 1L, 70L), (1L, 2L, 21L), (1L, 3L, 20L), (1L, 4L, 40L),
      (1L, 5L, 80L), (1L, 6L, 90L),
      (2L, 1L, 12L), (2L, 2L, 13L)
    ).toDF("query_id", "r_cs", "neighbor_id")
    val expect = fuseInPlan(bm, cs).collect().toSeq
    val got = graft.queries.TextQueries
      .fuseRrfLocal(spark, bm, cs).collect().toSeq
    assert(got == expect, s"\ngot    $got\nexpect $expect")
  }

  test("fusion on the real sf0.001 legs matches the in-plan fusion") {
    val bm = graft.queries.TextQueries.t06(spark, sf)
      .withColumnRenamed("rank", "r_bm").localCheckpoint(true)
    val cs = graft.queries.EmbeddingQueries.embedSearch(spark, sf)
      .withColumnRenamed("rank", "r_cs").localCheckpoint(true)
    val expect = fuseInPlan(bm, cs).collect().toSeq
    val got = graft.queries.TextQueries
      .fuseRrfLocal(spark, bm, cs).collect().toSeq
    assert(got == expect)
  }
}
