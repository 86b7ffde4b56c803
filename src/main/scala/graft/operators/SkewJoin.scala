package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew treatment for when one join key
  * is corpus-hot (a boilerplate document hash, a null-ish default id,
  * a celebrity user). AQE's skew-join splits oversized SHUFFLE
  * partitions, but only at sort-merge-join time; salting also covers
  * the cases AQE can't re-plan (bucketed inputs, aggregations keyed
  * on the hot value downstream) and makes the split explicit.
  */
object SkewJoin {

  /** Join `big` to `small` on `key`, spreading each big-side key over
    * `salts` sub-keys: big rows get a DETERMINISTIC per-row salt
    * (from `saltBy` — never rand(), whose re-evaluation under task
    * retry/speculation would route the same row to different salts
    * across attempts), the small side replicates `salts` times, and
    * the join runs on (key, salt). A key carrying f of the rows now
    * spreads over `salts` tasks at the cost of `salts` x |small|
    * duplication — the classic trade, correct for any inner equi-join
    * because every (big row, small row) pair still meets exactly once
    * (at the big row's salt).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val b = big.withColumn("__salt", pmod(saltBy, lit(salts)))
    val sm = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    b.join(sm, Seq(key, "__salt")).drop("__salt")
  }
}
