package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** a07: the co-located bucketed join must (a) agree with the plain
  * join and (b) actually be shuffle-free — no Exchange anywhere in
  * the join subtree, which is the entire point of paying the bucketed
  * write.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("a07 bucketed join equals the plain join result") {
    val got = SparkEntry.queries("a07_bucketed_join")(spark, sf).collect()
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
      .orderBy("o_orderpriority").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("a07 join subtree is exchange-free (bucket co-location)") {
    // join WITHOUT the final rollup: the only shuffle a07 is allowed
    // is the tiny post-join aggregation, so the bare join must have
    // no Exchange at all
    val q = SparkEntry.queries("a07_bucketed_join")(spark, sf)
    q.collect() // ensures bucketed tables exist + AQE finalizes
    val tag = s"${math.abs(sf.hashCode)}"
    val join = spark.table(s"graft_bkt_lineitem_$tag").hint("merge")
      .join(spark.table(s"graft_bkt_orders_$tag").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    assert(join.count() > 0)
    val plan = join.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
  }
}
