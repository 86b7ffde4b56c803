package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch collection maintenance — the Spark shape of the reference's
  * single-row insert/update/delete
  * (/root/reference/bigvectorbench/algorithms/base/module.py:140-180).
  * A distributed store applies mutations as *batches* merged into the
  * base relation: updates are latest-wins upserts (shuffle on the key,
  * map-side dedup via max_by), deletes are a broadcast anti-join.
  * This is the micro-batch compaction model (Delta/Hudi-style), which
  * is what survives at 100 TB — not per-row RPCs.
  */
object Mutations {

  /** Apply one mutation batch. All frames share `keyCol`; `upserts`
    * rows replace same-key base rows (insert if absent), `deletes`
    * keys are removed (after upsert resolution, i.e. delete wins).
    */
  def applyBatch(
      base: DataFrame,
      upserts: DataFrame,
      deletes: DataFrame,
      keyCol: String): DataFrame = {
    val cols = base.columns
    val versioned = base.select(cols.map(col): _*).withColumn("_v", lit(0))
      .unionByName(upserts.select(cols.map(col): _*).withColumn("_v", lit(1)))
    val resolved = versioned
      .groupBy(col(keyCol))
      .agg(max_by(struct(cols.filter(_ != keyCol).map(col): _*), col("_v")).as("_r"))
      .select(col(keyCol) +: cols.filter(_ != keyCol).map(c => col(s"_r.$c")): _*)
    resolved.join(broadcast(deletes.select(col(keyCol))), Seq(keyCol), "left_anti")
  }
}
