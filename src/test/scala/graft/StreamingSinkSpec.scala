package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for the streaming staging rule (EventStream's
  * MEMORY-SINK INVENTORY doc): a memory sink is a driver-resident
  * result table, allowed only for queries whose OUTPUT cardinality
  * is aggregate/join-bounded. This spec (a) pins the set of
  * `.format("memory")` sites in non-test source — a new one fails
  * until it is audited here or routed through the q43 file-sink
  * path — and (b) asserts each memory-sink-backed entry's result is
  * in fact reduced: far below the driving stream's row count, at the
  * documented per-query bound.
  */
class StreamingSinkSpec extends AnyFunSuite {
  import TestSpark._

  /** file (relative to src/main/scala/graft) -> expected number of
    * memory-sink sites. Bounds per site are documented in
    * EventStream's MEMORY-SINK INVENTORY block.
    */
  private val audited: Map[String, Int] = Map(
    "streaming/EventStream.scala" -> 6, // q31 q33 q34 q38 q40 q32
    "streaming/DocStream.scala" -> 1) // q44 near-dup pairs
    // (ProfStream's diagnostic sink retired with the r17 tools tidy)

  test("every memory sink in src/main is a registered, audited staging point") {
    val root = Paths.get("src/main/scala/graft")
    assume(Files.isDirectory(root))
    val found = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => root.relativize(p).toString ->
        """format\("memory"\)""".r
          .findAllIn(new String(Files.readAllBytes(p), "UTF-8")).length)
      .filter(_._2 > 0).toMap
    assert(found == audited,
      s"memory-sink drift: found $found, audited $audited — a new " +
        "memory sink needs an output-cardinality bound in EventStream's " +
        "inventory (or the q43 file-sink path if output is unbounded)")
  }

  test("each memory-sink entry's output is aggregate/join-bounded, not the stream") {
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    // per-query bound: (entry, the documented cardinality ceiling) —
    // every ceiling is a KEY-SPACE or MATCH-SET size, not the stream
    // length; at sf0.01 each sits far under the driving row count
    val events = spark.read.parquet(s"$sf/events.parquet")
    val nTypes = events.select("event_type").distinct().count()
    val nUsers = events.select("user_id").distinct().count()
    val spanHours = events.agg(
      (ceil((max(col("ts").cast("timestamp").cast("long"))
        - min(col("ts").cast("timestamp").cast("long")))
        / lit(3600L)) + 2).as("h")).head().getLong(0)
    val bounds: Seq[(String, Long)] = Seq(
      "q31_stream_ingest" -> nTypes * spanHours,
      "q33_stream_dedup" -> nEvents, // <= distinct dedup keys
      "q34_stream_upsert" -> nEvents, // <= distinct upserted ids
      "q38_stream_enrich" -> 32 * spanHours, // regions x windows
      "q32_stream_sessions" -> nUsers * spanHours * 2, // closed sessions
      "q40_stream_stream_join" -> nEvents, // interval-band pairs
      "q44_stream_near_dedup" -> nEvents) // near-dup pairs
    val offenders = bounds.flatMap { case (name, bound) =>
      val rows = SparkEntry.queries(name)(spark, sf).count()
      if (rows > bound) Some(s"$name: $rows rows > bound $bound")
      else None
    }
    assert(offenders.isEmpty, s"memory-sink output exceeded its " +
      s"documented bound: $offenders")
  }
}
