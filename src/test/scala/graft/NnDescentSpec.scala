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

  test("mid-capped candidate sampling is deterministic and keeps most of the recall") {
    import graft.operators.NnDescent
    val emb = Tables.embeddings(spark, sf)
      .filter(graft.queries.Split.isTrain(col("vec_id")))
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .localCheckpoint(true)
    // midCap = 16 bites: und degree is up to 2wk = 30 here, so the
    // pair join really runs on sampled groups — the branch every
    // >1M ScaleBench build takes
    val capped = NnDescent.build(base, k = 5, midCap = 16)
      .select("id", "neighbor_id").localCheckpoint(true)
    val exact = SparkEntry.queries("q25_graph_knn")(spark, sf)
      .select("id", "neighbor_id")
    val hit = capped.intersect(exact).count().toDouble
    val total = exact.count().toDouble
    info(f"mid-capped graph recall ${hit / total}%.3f")
    assert(hit / total >= 0.5, s"mid-capped graph recall ${hit / total}")
    val again = NnDescent.build(base, k = 5, midCap = 16)
      .select("id", "neighbor_id")
    assert(again.exceptAll(capped).count() == 0)
  }

  test("diversify's broadcast vector side (nKnown) changes the plan, not the result") {
    import graft.operators.{GraphSearch, NnDescent}
    val emb = Tables.embeddings(spark, sf)
      .filter(graft.queries.Split.isTrain(col("vec_id")))
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .localCheckpoint(true)
    val n = base.count()
    val knn = NnDescent.build(base, k = 8).localCheckpoint(true)
    val plain = GraphSearch.diversify(knn, base, 4, backfill = true)
    val bcast = GraphSearch.diversify(knn, base, 4, backfill = true,
      nKnown = n)
    assert(bcast.exceptAll(plain).count() == 0 &&
      plain.exceptAll(bcast).count() == 0)
  }
}
