package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operators don't express directly —
  * composed from union + window / bucketed equi-join rather than an
  * inequality join, which Catalyst would otherwise plan as a
  * BroadcastNestedLoopJoin (quadratic, the 100 TB killer).
  */
object TemporalJoins {

  /** Merge-as-of join: each probe row picks up the LATEST build row of
    * the same key with build.time <= probe.time, as a nullable `asof`
    * struct column. The plan is the distributed merge: tag both
    * inputs, union them, ONE shuffle on the key, and a running
    * `last(ignoreNulls)` over (time, tag) order — build rows sort
    * before probe rows at equal time, so a same-timestamp build row is
    * visible to the probe (>= semantics, matching DuckDB ASOF). No
    * row-pair blowup: cost is sort + linear scan per key, the same
    * shape a kdb/pandas merge_asof takes, and the window state is one
    * running value. Keys partition the work; a single pathological key
    * serializes only its own timeline (bounded for per-user/device
    * series; pre-split the key range if one key is corpus-sized).
    * Ties WITHIN build at equal (key, time) must be pre-deduplicated
    * by the caller to keep the result deterministic.
    */
  def asofJoin(probe: DataFrame, build: DataFrame,
      key: String, time: String): DataFrame = {
    val pCols = probe.columns.toIndexedSeq
    val pStruct = struct(pCols.map(col): _*)
    val bStruct = struct(build.columns.toIndexedSeq.map(col): _*)
    val pType = probe.select(pStruct).schema.head.dataType
    val bType = build.select(bStruct).schema.head.dataType
    val u = probe.select(col(key).as("__k"), col(time).as("__t"),
        lit(1).as("__src"), pStruct.as("__p"),
        lit(null).cast(bType).as("__b"))
      .unionByName(build.select(col(key).as("__k"), col(time).as("__t"),
        lit(0).as("__src"), lit(null).cast(pType).as("__p"),
        bStruct.as("__b")))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof", last("__b", ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(pCols.map(c => col(s"__p.$c").as(c)) :+ col("asof"): _*)
  }

  /** Bucketed range-join count: for each probe row, the number of
    * build rows of the same key with time in
    * (probe.time - lookback, probe.time]. A naive formulation is an
    * inequality join (quadratic); here time is quantized into
    * `lookback`-sized buckets, each probe row fans out to the two
    * buckets its window can span, the join is a plain EQUI-join on
    * (key, bucket) with the range predicate evaluated inside, and a
    * final count per probe row. Shuffle volume is 2x probe + 1x build
    * rows on short (key, bucket) keys; every build row can match a
    * probe row via exactly one of its two bucket copies, so nothing
    * double-counts. Per-task memory is one bucket pair, independent of
    * the corpus.
    */
  def rangeJoinCount(probe: DataFrame, build: DataFrame,
      key: String, time: String, lookback: Long,
      idCols: Seq[String]): DataFrame = {
    val pb = probe.withColumn("__bkt", explode(array(
      expr(s"$time div $lookback") - 1, expr(s"$time div $lookback"))))
    val bb = build.select(col(key).as("__bk"),
      col(time).as("__bt"),
      expr(s"$time div $lookback").as("__bkt"))
    pb.join(bb,
        pb(key) === bb("__bk") && pb("__bkt") === bb("__bkt") &&
          bb("__bt") > pb(time) - lookback && bb("__bt") <= pb(time),
        "left")
      .groupBy(idCols.map(col): _*)
      .agg(count(col("__bt")).as("n_matches"))
  }
}
