package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorCollection

class VectorCollectionSpec extends AnyFunSuite {
  import TestSpark._

  private def freshCollection(): VectorCollection = {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    new VectorCollection(spark, emb)
  }

  test("reference serving surface: index, query, CRUD, num_entities") {
    import spark.implicits._
    val coll = freshCollection()
    val n0 = coll.numEntities
    assert(n0 > 0)
    coll.createIndex()

    // single query: nearest neighbor of an existing vector is itself
    val v0 = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val res = coll.query(v0, 5)
    assert(res.head == 0L)
    assert(res.length == 5)

    // insert a duplicate of vector 0 under a new id: it becomes a
    // distance-0 neighbor without any index rebuild
    coll.insert(Seq((999999L, v0)).toDF("id", "vec"))
    assert(coll.numEntities == n0 + 1)
    val res2 = coll.query(v0, 5)
    assert(res2.take(2).toSet == Set(0L, 999999L))

    // delete the original: only the copy remains at distance 0
    coll.delete(Seq(0L).toDF("id"))
    assert(coll.numEntities == n0)
    val res3 = coll.query(v0, 5)
    assert(res3.head == 999999L)
    assert(!res3.contains(0L))

    // filtered query: restrict to ids below 100
    val res4 = coll.query(v0, 5, filterExpr = Some(col("id") < 100))
    assert(res4.forall(_ < 100))

    // batch query over the whole collection shape
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val batch = coll.batchQuery(queries, 3)
    assert(batch.groupBy("query_id").count().count() == 3)

    // per-query compound filter: each query q only accepts ids below
    // its own threshold column
    val fq = queries.withColumn("max_id", (col("query_id") + 1) * 200)
    val fres = coll.batchQueryFiltered(fq, 3, col("id") < col("max_id"))
      .collect()
    assert(fres.nonEmpty)
    fres.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(n < (q + 1) * 200, s"($q,$n) violates its per-query bound")
    }
  }
}
