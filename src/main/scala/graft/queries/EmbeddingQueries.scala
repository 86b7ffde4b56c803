package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.operators.{EmbeddingGen, KnnSearch}

/** Embedding-generation suite (SURVEY.md §2 e01-e03): the batch
  * embed-then-index leg of the reference workflow. All outputs are
  * scalar columns (the driver's comparator can't hash array cells)
  * and every query carries a DuckDB oracle: the TF-IDF variant uses a
  * deterministic (df DESC, term) vocabulary and a log-free pinned
  * idf, so weights are reproducible division/multiplication over
  * exact integers on both engines. The MLlib HashingTF path stays in
  * EmbeddingGen as the fixed-dim alternative (murmur3 feature hashing
  * isn't engine-portable, so it's exercised in EmbeddingSpec, not
  * here).
  */
object EmbeddingQueries {
  val VocabSize = 256
  val NQ = 5
  val K = 10

  /** Shared intermediate DataFrames, memoised per (session, dataset)
    * in the cross-module [[DfCache]] — termCounts here is the same
    * plan TextQueries' t06 uses, cached once for both.
    */
  private def cachedDf(s: SparkSession, dir: String, kind: String)(
      f: => DataFrame): DataFrame = DfCache(s, dir, kind)(f)

  /** e01: vocabulary TF-IDF, long format (doc_id, term, tf, df,
    * tfidf). Pinned formula: (tf / n_toks) * ((N + 1) / (df + 1)) —
    * two IEEE divisions and one multiply, bit-reproducible.
    */
  def embedTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.count()
    // tc feeds three consumers (doc lengths, vocab, the tfidf join) —
    // cache it or the tokenize+groupBy chain runs three times
    val tc = cachedDf(s, dir, "termCounts")(EmbeddingGen.termCounts(docs))
    val dl = tc.groupBy("doc_id").agg(sum("tf").as("n_toks"))
    val voc = EmbeddingGen.vocab(tc, VocabSize)
    tc.join(broadcast(voc), "term").join(dl, "doc_id")
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf").cast("double") / col("n_toks").cast("double")) *
          (lit((n + 1).toDouble) / (col("df") + 1).cast("double")))
          .as("tfidf"))
      .orderBy("doc_id", "term")
  }

  /** e02: exact unit normalization, exploded to (vec_id, dim, comp) —
    * comp = x / sqrt(dot(v, v)) pinned on both engines.
    */
  def normalizeVecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        sqrt(vec_dot(col("embedding"), col("embedding"))).as("nrm"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        (col("x").cast("double") / col("nrm")).as("comp"))
      .orderBy("vec_id", "dim")

  /** e03: end-to-end embed -> flat index -> cosine top-k over the
    * sparse integer BOW: dot products and norms are exact integer
    * sums (order-independent), the final cosine is one pinned double
    * expression. Held-out ([[Split]]): the searched corpus is the
    * train docs; queries are test docs excluded from it (vocab is
    * still corpus-wide — the embedding model sees all text, the
    * INDEX only train rows).
    */
  def embedSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tc = cachedDf(s, dir, "termCounts")(EmbeddingGen.termCounts(docs))
    val voc = EmbeddingGen.vocab(tc, VocabSize).select("term")
    // tv feeds norms, queries, and the dot join — cache the pruned
    // vocab projection, not the full term table
    val tv = cachedDf(s, dir, "termVocab")(tc.join(broadcast(voc), "term"))
    val corpus = tv.filter(Split.isTrain(col("doc_id")))
    val norms = corpus.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("nrm"))
    val q = tv.filter(Split.isQuery(col("doc_id"), NQ))
      .select(col("term"), col("doc_id").as("query_id"), col("tf").as("qtf"))
    val qnorms = q.groupBy("query_id").agg(sum(col("qtf") * col("qtf")).as("na"))
    val dots = corpus.join(q, "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("qtf")).as("dot"))
    val scored = dots
      .join(qnorms, "query_id")
      .join(norms.select(col("doc_id"), col("nrm").as("nb")), "doc_id")
      .select(col("query_id"),
        (col("dot").cast("double") /
          sqrt(col("na").cast("double") * col("nb").cast("double")))
          .as("score"),
        col("doc_id").as("id"))
    KnnSearch.topKOf(scored, K, asc = false)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_embed_tfidf" -> (embedTfidf _),
    "e02_normalize" -> (normalizeVecs _),
    "e03_embed_search" -> (embedSearch _)
  )

  /** Shared vocab CTEs (tokenize, tf, df, top-VocabSize vocab). */
  private val vocabCte =
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |voc AS (SELECT term, df FROM (
       |          SELECT term, df,
       |                 row_number() OVER (ORDER BY df DESC, term) AS r
       |          FROM dft) WHERE r <= $VocabSize)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "e01_embed_tfidf" ->
      s"""WITH $vocabCte,
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks
         |       FROM tf GROUP BY 1),
         |nd AS (SELECT count(*) AS n FROM documents)
         |SELECT tf.doc_id, tf.term, tf.tf AS tf, voc.df AS df,
         |       (CAST(tf.tf AS DOUBLE) / CAST(dl.n_toks AS DOUBLE)) *
         |       (CAST(nd.n + 1 AS DOUBLE) / CAST(voc.df + 1 AS DOUBLE)) AS tfidf
         |FROM tf JOIN voc USING (term) JOIN dl USING (doc_id) CROSS JOIN nd
         |ORDER BY doc_id, term""".stripMargin,
    "e02_normalize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT vec_id, CAST(i AS BIGINT) AS dim,
        |       v[i] / sqrt(list_inner_product(v, v)) AS comp
        |FROM e, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) u
        |ORDER BY vec_id, dim""".stripMargin,
    "e03_embed_search" ->
      s"""WITH $vocabCte,
         |tv AS (SELECT tf.doc_id, tf.term, tf.tf FROM tf JOIN voc USING (term)),
         |cp AS (SELECT doc_id, term, tf FROM tv
         |       WHERE ${Split.trainSql("doc_id")}),
         |nr AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nrm
         |       FROM cp GROUP BY 1),
         |qv AS (SELECT term, doc_id AS query_id, tf AS qtf
         |       FROM tv WHERE ${Split.querySql("doc_id", NQ)}),
         |qn AS (SELECT query_id, CAST(sum(qtf * qtf) AS BIGINT) AS nrm
         |       FROM qv GROUP BY 1),
         |dt AS (SELECT query_id, cp.doc_id,
         |              CAST(sum(cp.tf * qv.qtf) AS BIGINT) AS dot
         |       FROM cp JOIN qv USING (term) GROUP BY 1, 2)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT dt.query_id, dt.doc_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY dt.query_id ORDER BY
         |           CAST(dt.dot AS DOUBLE) /
         |           sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) DESC,
         |           dt.doc_id) AS rank
         |  FROM dt JOIN qn na ON na.query_id = dt.query_id
         |          JOIN nr nb ON nb.doc_id = dt.doc_id)
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  )
}
