package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's BaseANN serving surface
  * (/root/reference/bigvectorbench/algorithms/base/module.py:63-183 —
  * load_data / create_index / query / batch_query / insert / update /
  * delete / num_entities) mapped 1:1 onto the Spark operators, so a
  * reference user keeps their calling convention: a collection handle
  * with a built index and CRUD. Spark-shaped differences, by design:
  *
  *  - mutations take BATCHES (DataFrames), not single rows — the
  *    micro-batch compaction model that survives at 100 TB; a single
  *    row is just a 1-row batch.
  *  - `query` (the reference's per-vector call) is served from the
  *    built IVF index; `batchQuery` is the whole-DataFrame throughput
  *    path. Both accept the reference's filter expression as a
  *    Column predicate.
  *
  * `quantization` picks the in-cell scan the reference selects by
  * index type (milvus-ivfflat / ivfsq8 / ivfpq / scann):
  *
  *  - `"none"`   — exact vectors (IVF_FLAT); any metric.
  *  - `"sq8"`    — int8 affine codes, distance fused over codes
  *                 (IVF_SQ8); Euclidean.
  *  - `"pq"`     — product-quantization ADC scan + exact re-rank
  *                 (IVF_PQ); Euclidean.
  *  - `"pq_aniso"` — SCANN-family score-aware codes, MIPS ADC +
  *                 exact re-rank; InnerProduct.
  *
  * Quantization models are trained once in `createIndex` and FROZEN,
  * like the centroids: every mutation batch is encoded against the
  * existing models (O(batch), no rebuild — q28's contract).
  *
  * State is a checkpointed (id, vec) DataFrame + broadcastable
  * centroids/models; every mutation re-assigns ONLY its batch
  * (O(batch)), exactly like q28.
  */
class VectorCollection(
    spark: SparkSession,
    initial: DataFrame, // (id, vec, ...)
    nlist: Int = 16,
    nprobe: Int = 6,
    metric: VecMetric = VecMetric.Euclidean,
    quantization: String = "none",
    pqM: Int = 8,
    pqKStar: Int = 16,
    pqEta: Double = 4.0,
    rerank: Int = 10) {

  require(Set("none", "sq8", "pq", "pq_aniso")(quantization),
    s"unknown quantization '$quantization'")
  require(quantization != "sq8" && quantization != "pq" ||
    metric == VecMetric.Euclidean,
    s"$quantization serves Euclidean scans")
  require(quantization != "pq_aniso" || metric == VecMetric.InnerProduct,
    "pq_aniso is the score-aware MIPS index: use InnerProduct")

  private var assigned: DataFrame = _
  private var cents: Array[Array[Double]] = _
  private var sq: Sq8Index.Model = _
  private var pq: PqIndex.Model = _
  private var data: DataFrame = initial.localCheckpoint(true)

  /** Driver-resident serving replica for the single-query path: a
    * real vector DB answers query() from index state held in the
    * serving process, and below [[ServeLocalRows]] entities the whole
    * cell table IS that state (the same 64k driver budget as
    * GraphSearch's driver-resident top). Populated lazily on first
    * query(), invalidated by every mutation batch (rebuilt from the
    * post-mutation assigned table — O(entities) ≤ the bound), absent
    * above the bound or for quantized modes (their scans stay
    * distributed) — so a corpus-scale collection never pays or holds
    * it. Serving from it is bit-identical to the distributed probed
    * scan: same probe cells (probedQueriesLocal math), localScore
    * twins, (score, id) top-k ties — spec-gated against a 1-row
    * batchQuery.
    */
  private val ServeLocalRows = 1L << 16
  private var localCells:
    java.util.HashMap[Int, Array[(Long, Array[Float])]] = _
  private var localDirty = true

  private def localServe():
      Option[java.util.HashMap[Int, Array[(Long, Array[Float])]]] = {
    if (localDirty) {
      localDirty = false
      localCells =
        if (quantization != "none" || data.count() > ServeLocalRows) null
        else {
          val mp = new java.util.HashMap[Int,
            scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]]()
          assigned.select(col("cluster"), col("id"), col("vec"))
            .collect().foreach { r =>
              mp.computeIfAbsent(r.getInt(0),
                _ => scala.collection.mutable.ArrayBuffer.empty)
                .append((r.getLong(1), r.getSeq[Float](2).toArray))
            }
          val out = new java.util.HashMap[Int, Array[(Long, Array[Float])]]()
          mp.forEach((k, v) => out.put(k, v.toArray): Unit)
          out
        }
    }
    Option(localCells)
  }

  def numEntities: Long = data.count()

  /** Build the IVF index (+ quantization model) over the current
    * collection (reference create_index). Idempotent; mutations keep
    * it maintained incrementally afterwards.
    */
  def createIndex(): Unit = {
    cents = IvfIndex.sampleCentroids(data, "vec", nlist)
    quantization match {
      case "none"            => ()
      case "sq8"             => sq = Sq8Index.train(data, "vec")
      case "pq" | "pq_aniso" => pq = PqIndex.sampleModel(data, "vec", pqM, pqKStar)
    }
    assigned = withCodes(IvfIndex.assign(data, "vec", cents))
      .localCheckpoint(true)
    // a re-index after mutations re-samples centroids and re-clusters:
    // the serving replica is keyed by the OLD clustering and must be
    // rebuilt, or query() probes new centroids against stale cells
    localDirty = true
  }

  /** Encode a batch against the FROZEN quantization model. */
  private def withCodes(df: DataFrame): DataFrame = quantization match {
    case "none"     => df
    case "sq8"      => df.withColumn("codes", Sq8Index.encode(col("vec"), sq))
    case "pq"       => df.withColumn("codes", PqIndex.encode(col("vec"), pq))
    case "pq_aniso" =>
      df.withColumn("codes", PqIndex.encodeAniso(col("vec"), pq, pqEta))
  }

  private def requireIndex(): Unit =
    require(assigned != null, "createIndex() must run before queries")

  /** Reference single-vector query: top-n ids, optional filter.
    * Serving fast path: probe selection runs as driver math over the
    * in-memory centroids ([[IvfIndex.probedQueriesLocal]]), so the
    * call spends exactly ONE distributed job — the probed-cell scan —
    * instead of the probe-topk + checkpoint jobs the batch path pays.
    * Results are bit-identical to a 1-row [[batchQuery]] (spec gate).
    */
  def query(v: Array[Float], n: Int,
      filterExpr: Option[Column] = None): Seq[Long] = {
    requireIndex()
    import spark.implicits._
    // driver-resident serve (see [[localServe]]): probe cells with
    // the same driver math, scan them in process — ZERO Spark jobs
    // per query. filterExpr references collection columns only the
    // distributed scan carries, so a filtered query keeps that path.
    if (filterExpr.isEmpty) localServe() match {
      case Some(cells) =>
        val probeIdx = cents.zipWithIndex.map { case (c, i) =>
          var acc = 0.0; var j = 0
          val m = math.min(v.length, c.length)
          while (j < m) { val d = v(j).toDouble - c(j); acc += d * d; j += 1 }
          (math.sqrt(acc), i)
        }.sortBy { case (d, i) => (d, i) }.take(nprobe).map(_._2)
        val ord: Ordering[(Double, Long)] =
          if (metric.asc) Ordering.Tuple2(Ordering.Double.TotalOrdering,
            Ordering.Long)
          else Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse,
            Ordering.Long)
        return probeIdx.iterator
          .flatMap(ci => Option(cells.get(ci)).iterator.flatten)
          .map { case (id, vec) => (metric.localScore(v, vec), id) }
          .toArray.sorted(ord).take(n).map(_._2).toSeq
      case None => ()
    }
    val probed = IvfIndex.probedQueriesLocal(spark, Seq((0L, v)),
      cents, nprobe)
    val base = filterExpr.map(assigned.filter).getOrElse(assigned)
    val ranked = if (quantization == "none")
      IvfIndex.searchProbed(base, probed, n, metric)
    else {
      val q = Seq((0L, v)).toDF("query_id", "qvec")
      quantSearch(base, q, n, None, probed)
    }
    ranked.orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
  }

  /** Reference batch_query: (query_id, qvec) DataFrame in, ranked
    * (query_id, rank, neighbor_id, score) out.
    */
  def batchQuery(queries: DataFrame, n: Int,
      filterExpr: Option[Column] = None): DataFrame = {
    requireIndex()
    val base = filterExpr.map(assigned.filter).getOrElse(assigned)
    if (quantization == "none")
      IvfIndex.search(base, queries, cents, n, nprobe, metric)
    else quantSearch(base, queries, n, None,
      IvfIndex.probedQueries(queries, cents, nprobe))
  }

  /** The reference's filtered-query module shape: `queries` carries
    * per-query threshold columns alongside qvec, and `pairFilter`
    * relates them to the collection's attribute columns — evaluated
    * inside the probe join (q39's post-filter plan), so a static
    * `filterExpr` and a per-query `pairFilter` cost the same scan.
    */
  def batchQueryFiltered(queries: DataFrame, n: Int,
      pairFilter: Column): DataFrame = {
    requireIndex()
    if (quantization == "none")
      IvfIndex.search(assigned, queries, cents, n, nprobe, metric,
        pairFilter = Some(pairFilter))
    else quantSearch(assigned, queries, n, Some(pairFilter),
      IvfIndex.probedQueries(queries, cents, nprobe))
  }

  /** Quantized in-cell scan: probe cells, score CODES (never the
    * floats) inside probed cells, and for PQ recover recall with an
    * exact re-rank over the top n*rerank ADC candidates only.
    * `probed` is the caller's probe worklist — the batch path passes
    * [[IvfIndex.probedQueries]], the single-vector serving path the
    * driver-local equivalent.
    */
  private def quantSearch(base: DataFrame, queries: DataFrame, n: Int,
      pairFilter: Option[Column], probed: DataFrame): DataFrame = {
    quantization match {
      case "sq8" =>
        val joined = base.join(broadcast(probed), "cluster")
        val kept = pairFilter.map(joined.filter).getOrElse(joined)
        val scored = kept.select(col("query_id"),
          graft.functions.sq8_l2(col("qvec"), col("codes"),
            sq.mins, sq.scales).as("score"),
          col("id"))
        KnnSearch.topKOf(scored, n, asc = true)
      case _ => // pq | pq_aniso
        val adcAsc = metric.asc // L2 table ascends, dot table descends
        val tbl =
          if (metric == VecMetric.Euclidean) PqIndex.distTable(col("qvec"), pq)
          else PqIndex.dotTable(col("qvec"), pq)
        val joined = base.join(broadcast(probed.withColumn("tbl", tbl)), "cluster")
        val kept = pairFilter.map(joined.filter).getOrElse(joined)
        val cands = kept.select(col("query_id"), col("id"),
            graft.functions.pq_adc(col("codes"), col("tbl")).as("adc"))
          .groupBy("query_id")
          .agg(graft.functions.collect_topk(col("adc"), col("id"),
            n * rerank, adcAsc).as("topk"))
          .select(col("query_id"), explode(col("topk.id")).as("id"))
        val exact = cands
          .join(base.select(col("id"), col("vec")), "id")
          .join(broadcast(queries.select("query_id", "qvec")), "query_id")
          .select(col("query_id"),
            metric.score(col("qvec"), col("vec")).as("score"), col("id"))
        KnnSearch.topKOf(exact, n, metric.asc)
    }
  }

  /** Grouping search over the collection (q47's operator served from
    * the IVF index — the Milvus grouping_search API): per query, the
    * top-`g` groups by champion member among the probed cells, each
    * with that champion. Runs on the exact vectors inside probed
    * cells for every quantization mode: grouping wants one exact
    * champion per group, and an ADC-then-rerank detour would have to
    * re-rank per group anyway — same scan cost, more moving parts.
    * `groupCol` is any categorical column carried by the collection.
    */
  def groupedQuery(queries: DataFrame, g: Int,
      groupCol: String): DataFrame = {
    requireIndex()
    val probed = IvfIndex.probedQueries(queries, cents, nprobe)
    val raw = metric.score(col("qvec"), col("vec"))
    val rs = if (metric.asc) raw else negate(raw)
    val scored = assigned.join(broadcast(probed), "cluster")
      .select(col("query_id"), rs.as("rs"),
        col(groupCol).as("grp"), col("id"))
    GroupedSearch.championsOf(scored, g)
  }

  /** Range (ε-neighborhood) search over the collection — q05's
    * operator served from the IVF index: every probed-cell member
    * within `radius` of each query (ascending metrics). Same recall
    * contract as [[batchQuery]]: exact within probed cells, nprobe ==
    * nlist makes it the exact range search (spec gate). Runs on exact
    * vectors under every quantization mode — a radius threshold on
    * quantized scores has no calibrated meaning, the reference's
    * range queries are exact-distance too.
    */
  def rangeQuery(queries: DataFrame, radius: Double): DataFrame = {
    requireIndex()
    require(metric.asc, "rangeQuery expects a distance (ascending) metric")
    val probed = IvfIndex.probedQueries(queries, cents, nprobe)
    assigned.join(broadcast(probed), "cluster")
      .select(col("query_id"),
        metric.score(col("qvec"), col("vec")).as("score"),
        col("id").as("neighbor_id"))
      .filter(col("score") <= radius)
  }

  /** Paginated search over the collection (q48's operator served
    * from the IVF index — the Milvus search_iterator API works over
    * an index, not a full scan): distance-continuation pages over the
    * probed-cell candidate set. The probe set is FIXED across pages
    * (probedQueries is deterministic), so pages tile the probed-cell
    * ranking exactly — at nprobe == nlist that's the full-scan
    * iterator bit-for-bit (the spec gate); at nprobe < nlist recall
    * is the IVF contract, unchanged by pagination depth. Runs on the
    * exact vectors inside probed cells for every quantization mode:
    * a page boundary is a total-order (score, id) cut, and ADC scores
    * are not stable under re-rank across page boundaries.
    */
  def pagedQuery(queries: DataFrame, pageSize: Int,
      nPages: Int): DataFrame = {
    requireIndex()
    val probed = IvfIndex.probedQueries(queries, cents, nprobe)
    KnnSearch.iteratorPages(
      assigned.join(broadcast(probed), "cluster")
        .select(col("query_id"),
          metric.score(col("qvec"), col("vec")).as("score"), col("id")),
      pageSize, nPages, metric.asc)
  }

  private def applyMutation(upserts: DataFrame, deletes: DataFrame): Unit = {
    data = Mutations.applyBatch(data, upserts, deletes, "id")
      .localCheckpoint(true)
    if (assigned != null) {
      assigned = Mutations.applyBatch(assigned,
        withCodes(IvfIndex.assign(upserts, "vec", cents)), deletes, "id")
        .localCheckpoint(true)
    }
    localDirty = true // the serving replica re-collects post-mutation
  }

  private def emptyKeys: DataFrame = {
    import spark.implicits._
    Seq.empty[Long].toDF("id")
  }

  /** Reference insert: new rows (id, vec). */
  def insert(batch: DataFrame): Unit = applyMutation(batch, emptyKeys)

  /** Reference update: replace same-id rows (insert if absent). */
  def update(batch: DataFrame): Unit = applyMutation(batch, emptyKeys)

  /** Reference delete by id. */
  def delete(ids: DataFrame): Unit = {
    val none = data.filter(lit(false)).select("id", "vec").limit(0)
    applyMutation(none, ids.select("id"))
  }
}

/** The reference's multi-vector collection
  * (/root/reference/bigvectorbench/algorithms/milvus/module.py:331-458
  * MilvusMultiVector: an entity carries several vector fields, each
  * with its OWN index; hybrid_search issues one AnnSearchRequest per
  * field and fuses with RRFRanker). Spark shape: one
  * [[VectorCollection]] per field over the same id space — every
  * field keeps q20's IVF serving plan and q28's O(batch) mutation
  * contract — and [[hybridQuery]] is q49's fusion (per-field
  * top-`perFieldK` lists from the probed cells, RRF in pinned field
  * order, fusion cost fields x Q x perFieldK independent of base
  * size).
  *
  * `initial` carries `id` plus one vector column per entry of
  * `fields`; `queries` to [[hybridQuery]] carries `query_id` plus the
  * matching query-vector columns (same names).
  */
class MultiVectorCollection(
    spark: SparkSession,
    initial: DataFrame, // (id, <field cols>...)
    fields: Seq[String],
    nlist: Int = 16,
    nprobe: Int = 6,
    metric: VecMetric = VecMetric.Cosine) {
  require(fields.nonEmpty, "at least one vector field")

  private val cols: Seq[VectorCollection] = fields.map { f =>
    new VectorCollection(spark,
      initial.select(col("id"), col(f).as("vec")),
      nlist, nprobe, metric)
  }

  def numEntities: Long = cols.head.numEntities

  /** Build every field's index (reference create_index over a
    * multi-vector schema builds one index per vector field).
    */
  def createIndex(): Unit = cols.foreach(_.createIndex())

  /** The reference hybrid_search: per-field ANN against that field's
    * index, RRF-fused top-`n` per query.
    */
  def hybridQuery(queries: DataFrame, n: Int, perFieldK: Int = 50,
      rrfK: Int = 60): DataFrame = {
    val perField = fields.zip(cols).map { case (f, c) =>
      c.batchQuery(
        queries.select(col("query_id"), col(f).as("qvec")), perFieldK)
    }
    MultiVectorSearch.fuseRrf(perField, n, rrfK)
  }

  private def fieldBatch(batch: DataFrame, f: String): DataFrame =
    batch.select(col("id"), col(f).as("vec"))

  // the fan-out is not transactional: a mid-loop failure would leave
  // the per-field collections diverged, so reject malformed batches
  // BEFORE the first field mutates
  private def requireAllFields(batch: DataFrame): Unit = {
    val missing = ("id" +: fields).filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"mutation batch is missing column(s) ${missing.mkString(", ")}")
  }

  /** Reference insert/update/delete — fan out to every field's
    * collection (the reference's multi-vector CRUD mutates all vector
    * fields of the entity batch).
    */
  def insert(batch: DataFrame): Unit = {
    requireAllFields(batch)
    fields.zip(cols).foreach { case (f, c) => c.insert(fieldBatch(batch, f)) }
  }
  def update(batch: DataFrame): Unit = {
    requireAllFields(batch)
    fields.zip(cols).foreach { case (f, c) => c.update(fieldBatch(batch, f)) }
  }
  def delete(ids: DataFrame): Unit = cols.foreach(_.delete(ids))
}
