package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbeddingGen

class EmbeddingSpec extends AnyFunSuite {
  import TestSpark._

  test("tfidf embeddings have the configured dim and no all-zero rows") {
    val emb = EmbeddingGen.tfidf(Tables.documents(spark, sf), numFeatures = 256)
    assert(emb.filter(size(col("embedding")) =!= 256).count() == 0)
    val zeroRows = emb.filter(
      expr("aggregate(embedding, 0D, (a, x) -> a + abs(x)) = 0D")).count()
    assert(zeroRows == 0)
  }

  test("normalized vectors have unit L2 norm") {
    import graft.functions._
    val unit = Tables.embeddings(spark, sf)
      .select(EmbeddingGen.normalize(col("embedding")).as("u"))
      .select(vec_dot(col("u"), col("u")).as("n2"))
    val offenders = unit.filter(abs(col("n2") - 1.0) > 1e-9).count()
    assert(offenders == 0)
  }

  test("embed-and-search is out-of-sample: 5 held-out queries, train-only hits") {
    val out = SparkEntry.queries("e03_embed_search")(spark, sf).collect()
    val queries = out.map(_.getAs[Long]("query_id")).distinct.sorted
    assert(queries.toSeq == Seq(0L, 10L, 20L, 30L, 40L))
    out.foreach { r =>
      val n = r.getAs[Long]("neighbor_id")
      assert(n % 10 != 0, s"non-train neighbor $n returned")
    }
  }
}
