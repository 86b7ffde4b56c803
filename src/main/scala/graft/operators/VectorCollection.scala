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
  * State is a checkpointed (id, vec) DataFrame + broadcastable
  * centroids; every mutation re-assigns ONLY its batch (O(batch)),
  * exactly like q28.
  */
class VectorCollection(
    spark: SparkSession,
    initial: DataFrame, // (id, vec, ...)
    nlist: Int = 16,
    nprobe: Int = 6,
    metric: VecMetric = VecMetric.Euclidean) {

  private var assigned: DataFrame = _
  private var cents: Array[Array[Double]] = _
  private var data: DataFrame = initial.localCheckpoint(true)

  def numEntities: Long = data.count()

  /** Build the IVF index over the current collection (reference
    * create_index). Idempotent; mutations keep it maintained
    * incrementally afterwards.
    */
  def createIndex(): Unit = {
    cents = IvfIndex.sampleCentroids(data, "vec", nlist)
    assigned = IvfIndex.assign(data, "vec", cents).localCheckpoint(true)
  }

  private def requireIndex(): Unit =
    require(assigned != null, "createIndex() must run before queries")

  /** Reference single-vector query: top-n ids, optional filter. */
  def query(v: Array[Float], n: Int,
      filterExpr: Option[Column] = None): Seq[Long] = {
    requireIndex()
    import spark.implicits._
    val q = Seq((0L, v)).toDF("query_id", "qvec")
    val base = filterExpr.map(assigned.filter).getOrElse(assigned)
    IvfIndex.search(base, q, cents, n, nprobe, metric)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
  }

  /** Reference batch_query: (query_id, qvec) DataFrame in, ranked
    * (query_id, rank, neighbor_id, score) out.
    */
  def batchQuery(queries: DataFrame, n: Int,
      filterExpr: Option[Column] = None): DataFrame = {
    requireIndex()
    val base = filterExpr.map(assigned.filter).getOrElse(assigned)
    IvfIndex.search(base, queries, cents, n, nprobe, metric)
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
    IvfIndex.search(assigned, queries, cents, n, nprobe, metric,
      pairFilter = Some(pairFilter))
  }

  private def applyMutation(upserts: DataFrame, deletes: DataFrame): Unit = {
    data = Mutations.applyBatch(data, upserts, deletes, "id")
      .localCheckpoint(true)
    if (assigned != null) {
      assigned = Mutations.applyBatch(assigned,
        IvfIndex.assign(upserts, "vec", cents), deletes, "id")
        .localCheckpoint(true)
    }
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
