package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Index-structure suite (SURVEY.md §2 q12, q20-q25): Spark-native
  * analogs of the reference's FLAT/IVF/PQ/SQ8/LSH/graph index
  * families. Approximate + seed-dependent ⇒ rows-only driver check;
  * recall-vs-exact contracts live in IndexSpec.
  */
object IndexQueries {
  val K = 10
  val NQ = 10
  val NList = 16
  val NProbe = 6

  /** Index models are built once and queried many times (the
    * reference's create_index/query split — runner.py builds, then
    * serves). Memoise per (dataset, kind) so q12/q20/q21/q22 share
    * one IVF build instead of retraining identical centroids.
    */
  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), AnyRef]

  private def cached[T <: AnyRef](dir: String, kind: String)(f: => T): T =
    modelCache.getOrElseUpdate((dir, kind), f).asInstanceOf[T]

  private def baseAndQueries(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(s, dir)
    (emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      emb.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")))
  }

  private def ranked(df: DataFrame): DataFrame =
    df.select(col("query_id"), col("rank").cast("long").as("rank"),
      col("neighbor_id")).orderBy("query_id", "rank")

  def ivfFlat(s: SparkSession, dir: String): DataFrame = {
    val (base, queries) = baseAndQueries(s, dir)
    val cents = cached(dir, "ivf") { IvfIndex.train(base, "vec", NList) }
    val assigned = IvfIndex.assign(base, "vec", cents)
    ranked(IvfIndex.search(assigned, queries, cents, K, NProbe,
      VecMetric.Euclidean))
  }

  /** IVF cell pruning + PQ ADC scan + exact re-rank (the milvus-ivfpq
    * shape; codebooks on raw vectors rather than residuals — noted
    * deviation, recall recovered by the re-rank).
    */
  def ivfPq(s: SparkSession, dir: String): DataFrame = {
    val (base, queries) = baseAndQueries(s, dir)
    val cents = cached(dir, "ivf") { IvfIndex.train(base, "vec", NList) }
    val pq = cached(dir, "pq") { PqIndex.train(base, "vec", m = 8, kStar = 16) }
    val assigned = IvfIndex.assign(base, "vec", cents)
      .withColumn("codes", PqIndex.encode(col("vec"), pq))
    // probe worklist materialised with qvec; ADC table derived from it
    // post-checkpoint so no further join touches the base scan
    val probed = IvfIndex.probedQueries(queries, cents, NProbe)
      .withColumn("tbl", PqIndex.distTable(col("qvec"), pq))
      .select("query_id", "cluster", "tbl")
    val adc = assigned
      .join(broadcast(probed), "cluster")
      .select(col("query_id"), col("id"), col("vec"),
        PqIndex.adcDistance(col("codes"), col("tbl"), pq.m).as("adc"))
    val cands = adc.groupBy("query_id")
      .agg(graft.functions.collect_topk(col("adc"), col("id"), K * 10,
        asc = true).as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("id"))
    val exact = cands
      .join(base, "id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"),
        graft.functions.vec_l2(col("qvec"), col("vec")).as("score"), col("id"))
    ranked(KnnSearch.topKOf(exact, K, asc = true))
  }

  /** IVF pruning + SQ8 quantized scan. */
  def ivfSq8(s: SparkSession, dir: String): DataFrame = {
    val (base, queries) = baseAndQueries(s, dir)
    val cents = cached(dir, "ivf") { IvfIndex.train(base, "vec", NList) }
    val sq = cached(dir, "sq8") { Sq8Index.train(base, "vec") }
    val assigned = IvfIndex.assign(base, "vec", cents)
      .withColumn("codes", Sq8Index.encode(col("vec"), sq))
    val probed = IvfIndex.probedQueries(queries, cents, NProbe)
    val scored = assigned
      .join(broadcast(probed), "cluster")
      .select(col("query_id"),
        graft.functions.sq8_l2(col("qvec"), col("codes"),
          sq.mins, sq.scales).as("score"),
        col("id"))
    ranked(KnnSearch.topKOf(scored, K, asc = true))
  }

  /** q26: search against the *persisted* IVF layout — the scan reads
    * only probed cell partitions (PartitionFilters pruning), which is
    * the on-disk shape the index takes at 100 TB.
    */
  def ivfPersisted(s: SparkSession, dir: String): DataFrame = {
    val (base, queries) = baseAndQueries(s, dir)
    val cents = cached(dir, "ivf") { IvfIndex.train(base, "vec", NList) }
    val path = cached(dir, "ivf-path") {
      val p = java.nio.file.Files
        .createTempDirectory("graft_ivf_idx").toString
      IvfIndex.persistIndex(IvfIndex.assign(base, "vec", cents), p)
      p
    }
    ranked(IvfIndex.searchPersisted(s, path, queries, cents, K, NProbe,
      VecMetric.Euclidean))
  }

  def lshRhp(s: SparkSession, dir: String): DataFrame = {
    val (base, queries) = baseAndQueries(s, dir)
    val dim = base.select(size(col("vec"))).head().getInt(0)
    // on unstructured data the top-10 cosine neighbors sit near 60-70
    // degrees, so collision prob per bit is ~0.6: 6-bit bands x 16
    // tables gives ~0.6 recall at ~25% scan fraction. Structured
    // (real-embedding) corpora support far more selective params.
    val model = LshRhp.train(dim, nTables = 16, nBits = 6)
    ranked(LshRhp.search(base, queries, model, K))
  }

  def lshMinhash(s: SparkSession, dir: String): DataFrame =
    ranked(MinHashLshIndex.search(Tables.documents(s, dir),
      col("doc_id") < 5, K))

  /** q25: exact k-NN graph build (k=5, self excluded) — the batch
    * graph layer an HNSW-style index starts from.
    */
  def knnGraph(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("qvec"))
    val scored = base.crossJoin(broadcast(queries))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"),
        graft.functions.vec_l2(col("qvec"), col("vec")).as("score"), col("id"))
    KnnSearch.topKOf(scored, 5, asc = true)
      .select(col("query_id").as("id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
      .orderBy("id", "rank")
  }

  /** q27: NN-descent approximate graph (the scale path for q25 —
    * no N^2 cross join; see NnDescent).
    */
  def nnDescentGraph(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    NnDescent.build(base, k = 5).orderBy("id", "rank")
  }

  /** q12: recall@k of the IVF index against the exact kNN. */
  def recallAtK(s: SparkSession, dir: String): DataFrame = {
    val approx = ivfFlat(s, dir).select(col("query_id"), col("neighbor_id"))
    val (base, queries) = baseAndQueries(s, dir)
    val exact = KnnSearch.bruteForce(base, queries, K, VecMetric.Euclidean)
      .select(col("query_id"), col("neighbor_id"))
    approx.intersect(exact)
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
      .select(col("query_id"),
        (col("hits").cast("double") / lit(K.toDouble)).as("recall"))
      .orderBy("query_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_recall_at_k" -> (recallAtK _),
    "q20_ivf_flat" -> (ivfFlat _),
    "q21_ivf_pq" -> (ivfPq _),
    "q22_ivf_sq8" -> (ivfSq8 _),
    "q23_lsh_rhp" -> (lshRhp _),
    "q26_ivf_persisted" -> (ivfPersisted _),
    "q24_lsh_minhash" -> (lshMinhash _),
    "q25_graph_knn" -> (knnGraph _),
    "q27_nn_descent" -> (nnDescentGraph _)
  )

  /** q25 is exact ⇒ oracle-checkable; the rest are approximate. */
  val oracleSql: Map[String, String] = Map(
    "q25_graph_knn" ->
      s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT id, rank, neighbor_id FROM (
         |  SELECT a.id, b.id AS neighbor_id,
         |         row_number() OVER (PARTITION BY a.id
         |            ORDER BY list_distance(a.v, b.v), b.id) AS rank
         |  FROM e a CROSS JOIN e b WHERE a.id != b.id)
         |WHERE rank <= 5 ORDER BY id, rank""".stripMargin
  )
}
