package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CollectTopK
import graft.operators.KnnSearch

/** The top-k aggregate's buffers are unmanaged JVM objects invisible
  * to Spark's memory manager, so a task fed far past the sizing
  * target cannot spill — it OOMs (round 14: ~44M rows/task through a
  * 5M build killed an 80 GB heap with no earlier signal). The
  * aggregate now counts rows-per-task and logs an actionable sizing
  * warning while the job is still alive; this spec drives exactly
  * that hostile rows-per-partition shape and asserts the run
  * DEGRADES (warns, stays correct) instead of requiring a heap bump.
  */
class TopKSizingSpec extends AnyFunSuite {
  import TestSpark._

  test("collect_topk warns on a hostile rows-per-task ratio and stays correct") {
    val prev = CollectTopK.warnRowsPerTask
    CollectTopK.warnRowsPerTask = 100000L
    val before = CollectTopK.warningCount.get()
    try {
      // hostile by construction: ALL 400k scored rows stream through
      // ONE task's buffers (single input partition) — 4x the lowered
      // threshold, the same shape an undersized shuffle width
      // produces at 5M scale
      val scored = spark.range(0, 400000, 1, 1).select(
        pmod(col("id"), lit(7L)).as("query_id"),
        col("id").cast("double").as("score"),
        col("id"))
      val top = KnnSearch.topKOf(scored, 3, asc = true)
        .orderBy("query_id", "rank").collect()
      // correctness is untouched: per group, the 3 smallest ids
      assert(top.length == 21)
      val g0 = top.filter(_.getLong(0) == 0L).map(_.getLong(2)).toSeq
      assert(g0 == Seq(0L, 7L, 14L))
      assert(CollectTopK.warningCount.get() > before,
        "expected a rows-per-task sizing warning from the update path")
    } finally CollectTopK.warnRowsPerTask = prev
  }

  test("well-sized tasks never warn") {
    val prev = CollectTopK.warnRowsPerTask
    CollectTopK.warnRowsPerTask = 100000L
    val before = CollectTopK.warningCount.get()
    try {
      // same volume spread over 8 partitions: 50k rows/task, under
      // the threshold — the warning must not fire on healthy sizing
      val scored = spark.range(0, 400000, 1, 8).select(
        pmod(col("id"), lit(7L)).as("query_id"),
        col("id").cast("double").as("score"),
        col("id"))
      assert(KnnSearch.topKOf(scored, 3, asc = true).count() == 21)
      assert(CollectTopK.warningCount.get() == before,
        "sizing warning fired on a well-sized task")
    } finally CollectTopK.warnRowsPerTask = prev
  }
}
