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

  test("embed-and-search: each query doc's rank-1 hit is itself") {
    val out = SparkEntry.queries("e03_embed_search")(spark, sf)
      .filter(col("rank") === 1).collect()
    assert(out.length == 5)
    out.foreach(r =>
      assert(r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
  }
}
