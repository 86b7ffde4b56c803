package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // N docs as a 1-row broadcast frame (t06's device): a count()
    // here is a synchronous full scan before the query plans; the
    // in-plan (N + 1) double is the same IEEE value
    val nd = docs.agg((count(lit(1)) + 1L).cast("double").as("n1"))
    // tc feeds three consumers (doc lengths, vocab, the tfidf join) —
    // cache it or the tokenize+groupBy chain runs three times
    val tc = cachedDf(s, dir, "termCounts")(EmbeddingGen.termCounts(docs))
    val dl = tc.groupBy("doc_id").agg(sum("tf").as("n_toks"))
    val voc = EmbeddingGen.vocab(tc, VocabSize)
    tc.join(broadcast(voc), "term").join(dl, "doc_id")
      .crossJoin(broadcast(nd))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf").cast("double") / col("n_toks").cast("double")) *
          (col("n1") / (col("df") + 1).cast("double")))
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

  val InD = 64
  val OutD = 24
  val RerankR = 100
  val ProjSeed = 7L

  /** Rademacher sign matrix (OutD × InD, ±1), drawn once from
    * java.util.Random([[ProjSeed]]) — the JDK LCG is bit-specified,
    * so the matrix is a stable constant; its literal values are
    * embedded in BOTH the Spark plan and the oracle SQL (the same
    * shared-literal discipline the poly-hash coefficients use).
    * A hash-parity "matrix" is NOT usable here: adjacent rows of
    * cheap arithmetic hashes over (i·InD + j) are heavily correlated
    * (measured |row·row'|/InD up to 0.94), which collapses the
    * projection to ~1 effective dimension and near-random recall.
    */
  private[graft] val Signs: Array[Array[Double]] = {
    val rnd = new java.util.Random(ProjSeed)
    Array.fill(OutD, InD)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Deterministic Rademacher projection y_i = (Σ_j s_ij·x_j)/√OutD,
    * via the fused codegen'd [[graft.functions.MatProject]] kernel.
    * The j fold is ascending on both engines and √OutD is one
    * correctly-rounded IEEE sqrt, so components are bit-exact
    * reproducible (spec asserts equality with the HOF formulation).
    */
  private[graft] def projectExpr(vec: Column): Column =
    graft.functions.mat_project(vec, Signs, math.sqrt(OutD.toDouble))

  /** DuckDB literal for [[Signs]] (a list-of-list constant). */
  private def signsSql: String =
    Signs.map(_.map(s => if (s > 0) "1.0" else "-1.0")
      .mkString("[", ",", "]")).mkString("[", ",", "]")

  /** e04: random-projection dimensionality reduction (InD → OutD) —
    * the embedding-pipeline step that makes 100 TB candidate
    * generation affordable: a ~2.7× narrower vector per scanned row,
    * computed scan-local (one projection expression against a
    * broadcast literal matrix, no shuffle, no model state). Output
    * exploded to scalar (vec_id, dim, comp) rows for the exact
    * comparator.
    */
  def randomProjection(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        posexplode(projectExpr(col("embedding"))).as(Seq("pos", "comp")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        col("comp"))
      .orderBy("vec_id", "dim")

  /** e05: the two-stage search the projection exists for — stage 1
    * scans the REDUCED vectors (OutD/InD of the bytes) for
    * top-[[RerankR]] candidates per held-out query, stage 2 reranks
    * only those R rows on full dims for the final top-k. At scale the
    * full-dim table is touched R-rows-per-query deep instead of
    * end-to-end — the classic ANN memory/recall lever, exactly
    * reproducible here because the projection is deterministic.
    */
  def reducedSearch(s: SparkSession, dir: String): DataFrame = {
    val proj = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        projectExpr(col("embedding")).as("rv"))
    val base = proj.filter(Split.isTrain(col("vec_id")))
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("rv"))
    val qs = proj.filter(Split.isQuery(col("vec_id"), NQ))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("rv").as("qrv"))
    val cands = KnnSearch.bruteForce(base, qs, RerankR,
      graft.operators.VecMetric.Euclidean, vecCol = "rv", qvecCol = "qrv")
      .select(col("query_id"), col("neighbor_id").as("id"))
    // broadcast the Q×R candidate ids INTO one scan of the full-dim
    // table — never shuffle the base on id for a tiny fetch list
    val rerank = base.select(col("id"), col("vec"))
      .join(broadcast(cands), "id")
      .join(broadcast(qs.select(col("query_id"), col("qvec"))), "query_id")
      .select(col("query_id"),
        graft.functions.vec_l2(col("qvec"), col("vec")).as("score"),
        col("id"))
    KnnSearch.topKOf(rerank, K, asc = true)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e01_embed_tfidf" -> (embedTfidf _),
    "e02_normalize" -> (normalizeVecs _),
    "e03_embed_search" -> (embedSearch _),
    "e04_random_projection" -> (randomProjection _),
    "e05_reduced_search" -> (reducedSearch _)
  )

  /** Shared vocab CTEs (tokenize, tf, df, top-VocabSize vocab).
    * Reused by IndexQueries' m05_mm_ann oracle (the modal query frame
    * is built from this exact vocabulary).
    */
  private[queries] val vocabCte =
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
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin,
    "e04_random_projection" ->
      s"""WITH m AS (SELECT $signsSql AS s),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |d AS (SELECT unnest(range(0, $OutD)) AS i)
         |SELECT e.vec_id, CAST(d.i + 1 AS BIGINT) AS dim,
         |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |         list_transform(range(0, $InD), j ->
         |           m.s[d.i + 1][j + 1] * e.v[j + 1])),
         |         (acc, x) -> acc + x) / sqrt(CAST($OutD AS DOUBLE)) AS comp
         |FROM e CROSS JOIN d CROSS JOIN m
         |ORDER BY vec_id, dim""".stripMargin,
    "e05_reduced_search" ->
      s"""WITH m AS (SELECT $signsSql AS s),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |y AS (SELECT vec_id, v,
         |        list_transform(range(0, $OutD), i ->
         |          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |            list_transform(range(0, $InD), j ->
         |              m.s[i + 1][j + 1] * v[j + 1])),
         |            (acc, x) -> acc + x) / sqrt(CAST($OutD AS DOUBLE))) AS rv
         |      FROM e CROSS JOIN m),
         |b AS (SELECT vec_id AS id, v, rv FROM y
         |      WHERE ${Split.trainSql("vec_id")}),
         |q AS (SELECT vec_id AS query_id, v AS qv, rv AS qrv FROM y
         |      WHERE ${Split.querySql("vec_id", NQ)}),
         |cand AS (SELECT query_id, id, qv, v FROM (
         |           SELECT q.query_id, b.id, q.qv, b.v,
         |                  row_number() OVER (PARTITION BY q.query_id
         |                    ORDER BY list_distance(q.qrv, b.rv), b.id) AS rr
         |           FROM q CROSS JOIN b)
         |         WHERE rr <= $RerankR)
         |SELECT query_id, rank, neighbor_id FROM (
         |  SELECT query_id, id AS neighbor_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY list_distance(qv, v), id) AS rank
         |  FROM cand)
         |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin
  )
}
