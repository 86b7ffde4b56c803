package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.datagen.DataGen
import graft.functions._
import graft.operators.{KnnSearch, VecMetric}

class DataGenSpec extends AnyFunSuite {
  import TestSpark._

  test("randomFloat is deterministic and partitioning-independent") {
    val a = DataGen.randomFloat(spark, 200, 8, 4, seed = 9)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2))).toMap
    val b = DataGen.randomFloat(spark, 200, 8, 4, seed = 9)
      .repartition(7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2))).toMap
    assert(a == b)
    // a different seed moves the data
    val c = DataGen.randomFloat(spark, 200, 8, 4, seed = 10)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2))).toMap
    assert(a != c)
  }

  test("randomFloat produces blob structure: intra-cluster tighter than inter") {
    val df = DataGen.randomFloat(spark, 400, 16, 4, seed = 3)
      .select(col("vec_id").as("ia"), col("label").as("la"),
        col("embedding").as("va"))
    val other = df.select(col("ia").as("ib"), col("la").as("lb"),
      col("va").as("vb"))
    val stats = df.crossJoin(other).filter(col("ia") < col("ib"))
      .select(col("la") === col("lb"), vec_l2(col("va"), col("vb")))
      .toDF("same", "d")
      .groupBy("same").agg(avg("d").as("avg_d"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(stats(true) < stats(false) * 0.7,
      s"intra ${stats(true)} not well below inter ${stats(false)}")
  }

  test("split is exactly 10% test by id") {
    val df = DataGen.randomFloat(spark, 1001, 4, 2)
    assert(df.filter(!col("is_train")).count() == 101) // ids 0,10,...,1000
    assert(df.filter(col("is_train")).count() == 900)
  }

  test("randomJaccard emits sorted distinct sets of the exact size") {
    val rows = DataGen.randomJaccard(spark, 100, 10, 40, seed = 5)
      .select("elems").collect().map(_.getSeq[Int](0))
    rows.foreach { s =>
      assert(s.length == 10)
      assert(s == s.sorted)
      assert(s.distinct.length == 10)
      assert(s.forall(e => e >= 0 && e < 40))
    }
    // sets differ across rows
    assert(rows.map(_.toList).distinct.length > 90)
  }

  test("randomFilter labels are uniform-ish ints in [0, 100)") {
    val df = DataGen.randomFilter(spark, 500, 4, 2, nFilters = 2)
    assert(df.columns.count(_.startsWith("label_")) == 2)
    val mm = df.agg(min("label_0"), max("label_0"), min("label_1"),
      max("label_1")).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) < 100)
    assert(mm.getInt(2) >= 0 && mm.getInt(3) < 100)
    // both tails occupied — uniform over 0..99 at n=500
    assert(mm.getInt(0) < 10 && mm.getInt(1) >= 90)
  }

  test("randomBitstring packs to ceil(dims/64) words and matches float signs") {
    val fl = DataGen.randomFloat(spark, 50, 70, 4, seed = 2)
    val bs = DataGen.randomBitstring(spark, 50, 70, 4, seed = 2)
    assert(bs.select(max(size(col("bits")))).head().getInt(0) == 2)
    val joined = fl.select(col("vec_id"), pack_bits(col("embedding"), 64).as("p"))
      .join(bs.select(col("vec_id"), col("bits")), "vec_id")
      .filter(col("p") =!= col("bits")).count()
    assert(joined == 0)
  }

  test("e2e: filter corpus drives per-query compound filtered search") {
    val corpus = DataGen.randomFilter(spark, 600, 16, 4, nFilters = 2,
      seed = 11)
    val base = corpus.filter(col("is_train"))
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label_0").as("l0"), col("label_1").as("l1"))
    val queries = corpus.filter(!col("is_train")).limit(5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        (col("label_0") + 20).as("t0"), (col("label_1") + 20).as("t1"))
    val got = KnnSearch.bruteForce(base, queries, 5, VecMetric.Euclidean,
      pairFilter = Some(col("l0") <= col("t0") && col("l1") <= col("t1")))
    // every neighbor satisfies its query's threshold tuple
    val viol = got
      .join(base.select(col("id").as("neighbor_id"), col("l0"), col("l1")),
        "neighbor_id")
      .join(queries.select(col("query_id"), col("t0"), col("t1")), "query_id")
      .filter(col("l0") > col("t0") || col("l1") > col("t1")).count()
    assert(viol == 0)
    assert(got.count() > 0)
  }

  test("e2e: bitstring corpus drives packed-hamming search, blobs survive packing") {
    val corpus = DataGen.randomBitstring(spark, 500, 128, 4, seed = 13)
    val base = corpus.filter(col("is_train"))
      .select(col("vec_id").as("id"), col("label").as("bl"),
        col("bits").as("vec"))
    val queries = corpus.filter(!col("is_train")).limit(20)
      .select(col("vec_id").as("query_id"), col("label").as("ql"),
        col("bits").as("qvec"))
    val scored = base.crossJoin(broadcast(queries))
      .select(col("query_id"), col("ql"), col("bl"),
        packed_hamming(col("qvec"), col("vec")).cast("double").as("score"),
        col("id"))
    val top1 = KnnSearch.topKOf(scored.select("query_id", "score", "id"), 1,
      asc = true)
      .join(queries.select(col("query_id"), col("ql")), "query_id")
      .join(base.select(col("id").as("neighbor_id"), col("bl")), "neighbor_id")
    // sign-packed blobs keep cluster structure: rank-1 neighbor shares
    // the cluster label for the vast majority of queries
    val agree = top1.filter(col("ql") === col("bl")).count()
    assert(agree >= 18, s"only $agree/20 rank-1 neighbors in-cluster")
  }

  test("g01 summary matches the literal oracle shape") {
    val df = queries.DataGenQueries.g01(spark, sf)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq ==
      Seq("bitstring", "filter", "float", "jaccard", "mv"))
    rows.foreach { case (_, n, tr, te, _) =>
      assert(n == 2000L && tr == 1800L && te == 200L)
    }
  }
}
