package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NnDescentSpec extends AnyFunSuite {
  import TestSpark._

  test("nn-descent graph recovers most of the exact graph without N^2 work") {
    val approx = SparkEntry.queries("q27_nn_descent")(spark, sf)
      .select("id", "neighbor_id")
    val exact = SparkEntry.queries("q25_graph_knn")(spark, sf)
      .select("id", "neighbor_id")
    val hit = approx.intersect(exact).count().toDouble
    val total = exact.count().toDouble
    assert(hit / total >= 0.6, s"graph recall ${hit / total}")
    // determinism
    val again = SparkEntry.queries("q27_nn_descent")(spark, sf)
      .select("id", "neighbor_id")
    assert(again.exceptAll(approx).count() == 0)
  }
}
