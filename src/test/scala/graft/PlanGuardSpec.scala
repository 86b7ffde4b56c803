package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale guard across the whole query surface: no query's FINAL plan
  * may contain a CartesianProduct — the both-sides-materialised
  * all-pairs join that no cluster survives at 100 TB. (Broadcast
  * nested-loop joins are allowed: one side is broadcast-bounded by
  * construction, which is the intended shape for tiny query/dim
  * sides.) Internal stages cut by localCheckpoint are out of scope;
  * this pins the lineage each query actually returns.
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

  test("no query's final plan contains a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct planned by: $offenders")
  }

  test("no query's final plan contains a partitionless Window") {
    // the all-rows-through-one-task shape (d09's pre-fix straggler);
    // every ranking in the surface must partition its window or rank
    // on the driver over a provably bounded frame
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val globals = fn(spark, sf).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"partitionless Window planned by: $offenders")
  }
}
