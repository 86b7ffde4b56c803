package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Held-out train/test split for every ANN query entry — the
  * reference's evaluation contract (train_test_split, reference
  * datasets.py:397-399): queries are drawn from a test split that is
  * EXCLUDED from the indexed base, so retrieval is out-of-sample and
  * recall numbers are honest (self-retrieval trivially ranks the
  * query row first). The split is id-deterministic (id % 10 == 0 →
  * test — DataGen's convention, the reference's test_size=0.1) so the
  * DuckDB oracle reproduces it with the same predicate and split
  * sizes are exactly derivable at any scale.
  */
object Split {
  val Mod = 10

  /** Rows the index is built over (the train split). */
  def isTrain(id: Column): Column = id % Mod =!= 0

  /** The first `nq` test rows, by id — the gated query workload. */
  def isQuery(id: Column, nq: Int): Column =
    id % Mod === 0 && id < nq.toLong * Mod

  /** All test rows — batch/throughput workloads. */
  def isTest(id: Column): Column = id % Mod === 0

  def trainSql(id: String): String = s"$id % $Mod <> 0"

  def querySql(id: String, nq: Int): String =
    s"$id % $Mod = 0 AND $id < ${nq.toLong * Mod}"

  def testSql(id: String): String = s"$id % $Mod = 0"
}
