package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Random-hyperplane LSH for angular distance (the classic SimHash-
  * for-vectors scheme) — ntables independent nbits-bit signatures;
  * near vectors collide in some table whp. Search joins query and
  * base on (table, signature-bucket), then exact-re-ranks the
  * candidates. The shuffle key is a (int, long) pair — at 100 TB the
  * bucket join moves signatures, not vectors, and skewed buckets are
  * AQE-salvageable.
  */
object LshRhp {

  case class Model(planes: Array[Array[Array[Double]]]) // table x bit x dim

  def train(dim: Int, nTables: Int, nBits: Int, seed: Long = 42L): Model = {
    val rng = new scala.util.Random(seed)
    Model(Array.fill(nTables, nBits, dim)(rng.nextGaussian()))
  }

  /** Deterministic, engine-portable hyperplanes: plane j is the
    * difference of the sample vectors ranked 2j and 2j+1 by id —
    * random directions drawn from the data itself (pairwise
    * differences of uniform samples), reproducible in the DuckDB
    * oracle as ORDER BY id LIMIT 2*j. Gaussian [[train]] stays as the
    * alternative when id-order sampling is unavailable.
    */
  def trainFromData(base: DataFrame, vecCol: String, nTables: Int,
      nBits: Int, idCol: String = "id"): Model = {
    val need = nTables * nBits * 2
    val vs = base.orderBy(idCol).limit(need)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(vs.length >= need, s"need $need sample vectors, got ${vs.length}")
    val planes = Array.tabulate(nTables, nBits) { (t, b) =>
      val j = t * nBits + b
      vs(2 * j).zip(vs(2 * j + 1)).map { case (x, y) => x - y }
    }
    Model(planes)
  }

  /** (id-col, table, bucket) rows for every table — signatures come
    * from one fused pass (LshSigs), then posexplode.
    */
  def buckets(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    df.select(col(idCol),
      posexplode(lsh_sigs(col(vecCol), model.planes)).as(Seq("table", "bucket")))

  /** LSH search: bucket-join candidates, exact cosine re-rank.
    *
    * `multiProbe` > 0 additionally probes the buckets at hamming
    * distance 1 in the first `multiProbe` signature bits (the classic
    * multi-probe trick): near-misses that flipped one hyperplane side
    * are recovered WITHOUT adding tables — candidate volume grows
    * ~(multiProbe+1)x per query while index size stays fixed, which
    * is the right trade at 100 TB where tables cost storage and
    * probes cost only query-side fan-out. multiProbe = nBits probes
    * the full 1-flip neighborhood.
    */
  def search(
      base: DataFrame, // (id, vec)
      queries: DataFrame, // (query_id, qvec)
      model: Model,
      k: Int,
      multiProbe: Int = 0): DataFrame = {
    val nBits = model.planes(0).length
    require(multiProbe >= 0 && multiProbe <= nBits,
      s"multiProbe must be in [0, $nBits], got $multiProbe")
    val bb = buckets(base, "id", "vec", model)
    val qb0 = buckets(queries, "query_id", "qvec", model)
    val qb = if (multiProbe == 0) qb0
    else qb0.select(col("query_id"), col("table"),
      explode(concat(array(col("bucket")),
        expr(s"transform(sequence(0, ${multiProbe - 1}), " +
          "j -> bucket ^ shiftleft(1L, j))"))).as("bucket"))
    val cands = bb.join(broadcast(qb), Seq("table", "bucket"))
      .select("query_id", "id").distinct()
    val scored = cands
      .join(base, "id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"),
        vec_cosine_sim(col("qvec"), col("vec")).as("score"), col("id"))
    KnnSearch.topKOf(scored, k, asc = false)
  }
}

/** MinHash-LSH as a jaccard *search* index (the reference's jaccard
  * metric datasets served as top-k): bucket-join on minhash bands,
  * exact jaccard re-rank of candidates.
  */
object MinHashLshIndex {

  /** `baseIds` restricts the SEARCHED corpus (e.g. to a train split
    * while `queryIds` selects held-out test docs); signatures are
    * still computed once over all docs and filtered per side.
    */
  def search(
      docs: DataFrame, // (doc_id, text)
      queryIds: Column,
      k: Int,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      seed: Long = 42L,
      baseIds: Column = lit(true)): DataFrame = {
    val sh = Dedup.shingles(docs, n = 1)
      .select(col("doc_id"), col("sh").as("toks"))
    val sig = Dedup.minhashSignatures(
      sh.select(col("doc_id"), col("toks").as("sh")),
      bands * rowsPerBand, seed)
    // bucket key = the band's raw signature slice (4 longs). At scale
    // you'd xxhash64-compress the slice to one long; the raw slice is
    // equality-identical and keeps the key DuckDB-replicable.
    // feeds both the base side and (filtered) the query side of the
    // bucket join — materialise the signature pass once
    val banded = sig.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), " +
        s"b -> slice(sigs, b * $rowsPerBand + 1, $rowsPerBand))"))
      .as(Seq("band", "bucket")))
      .localCheckpoint(true)
    val qb = banded.filter(queryIds)
      .toDF("query_id", "band", "bucket")
    val cands = banded.filter(baseIds)
      .join(broadcast(qb), Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("query_id"))
      .select("query_id", "doc_id").distinct()
    val scored = cands
      .join(sh.select(col("doc_id"), col("toks")), "doc_id")
      .join(broadcast(sh.select(col("doc_id").as("query_id"),
        col("toks").as("qtoks"))), "query_id")
      .select(
        col("query_id"),
        (size(array_intersect(col("qtoks"), col("toks"))).cast("double") /
          (size(col("qtoks")) + size(col("toks")) -
            size(array_intersect(col("qtoks"), col("toks")))).cast("double"))
          .as("score"),
        col("doc_id").as("id"))
    KnnSearch.topKOf(scored, k, asc = false)
  }
}
