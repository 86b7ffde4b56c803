package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-op CRUD against an immutable base relation — the reference
  * runner times INDIVIDUAL insert/update/delete calls
  * (runner.py:245-330 run_individual_insert/update/delete) and stores
  * the latency series. A distributed index can't rewrite its base per
  * op; the shape that serves per-op mutations at 100 TB is a
  * write-ahead LOG: each op appends one record (cost: O(op bytes),
  * independent of base size), reads merge base ⊕ log last-op-wins
  * (q28/q30's merge semantics), and compaction folds the log back in
  * batches (q30). So the honest per-op latency of this engine IS the
  * log append, and that is what [[Writer.append]] times.
  */
object MutationLog {

  val Schema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("op", StringType),
    StructField("id", LongType),
    StructField("vec", ArrayType(FloatType))))

  /** Append-only JSONL op log. Java's Float.toString is shortest
    * round-trip repr, so vectors survive the text encoding exactly.
    * Flush per append (group commit / fsync policy would layer here).
    */
  final class Writer(dir: String) extends AutoCloseable {
    new java.io.File(dir).mkdirs()
    private val out = new java.io.BufferedWriter(new java.io.FileWriter(
      new java.io.File(dir, "ops.jsonl"), true))
    private var seq = 0L

    /** Apply one op; returns its latency in nanoseconds. */
    def append(op: String, id: Long, vec: Array[Float]): Long = {
      val line = s"""{"seq":$seq,"op":"$op","id":$id,"vec":[${
        vec.mkString(",")}]}"""
      val t0 = System.nanoTime()
      out.write(line)
      out.newLine()
      out.flush()
      val dt = System.nanoTime() - t0
      seq += 1
      dt
    }

    def close(): Unit = out.close()
  }

  /** Merge-on-read: base ⊕ log, last op per id wins (by seq), delete
    * removes. The log side is small by contract (it is compacted into
    * the base in batches); broadcast it so the base never shuffles.
    */
  def replay(base: DataFrame, logDir: String): DataFrame = {
    val spark = base.sparkSession
    val log = spark.read.schema(Schema).json(logDir)
    val last = log.groupBy("id")
      .agg(max_by(struct(col("op"), col("vec")), col("seq")).as("f"))
    val survivors = last.filter(col("f.op") =!= "delete")
      .select(col("id"), col("f.vec").as("vec"))
    base.join(broadcast(last.select("id")), Seq("id"), "left_anti")
      .unionByName(survivors)
  }
}
