package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q34: the flatMapGroupsWithState upsert-merge must agree with the
  * batch latest-wins semantics under any micro-batching, and be
  * deterministic across reruns.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("stream upsert-merge equals batch latest-wins minus tombstones") {
    val out = SparkEntry.queries("q34_stream_upsert")(spark, sf)
    val evRaw = Tables.events(spark, sf)
    val ev = evRaw
      .select(col("user_id"), EventTime.tsUs(evRaw).as("ts_us"),
        col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents"))
    val batch = ev.groupBy("user_id")
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"),
        col("value_cents"))).as("w"))
      .select(col("user_id"), col("w.ts_us").as("ts_us"),
        col("w.event_id").as("event_id"),
        col("w.event_type").as("event_type"),
        col("w.value_cents").as("value_cents"))
      .filter(col("event_type") =!= "error")
      .orderBy("user_id")
    assert(out.collect().toSeq == batch.collect().toSeq)
    // live keys only: every tombstoned user is absent
    assert(out.filter(col("event_type") === "error").count() == 0)
    // deterministic rerun
    val again = SparkEntry.queries("q34_stream_upsert")(spark, sf)
    assert(again.collect().toSeq == out.collect().toSeq)
  }

  test("q44 streaming near-dedup equals batch minhash LSH pairs") {
    val out = SparkEntry.queries("q44_stream_near_dedup")(spark, sf)
    val batch = SparkEntry.queries("d03_dedup_minhash_lsh")(spark, sf)
    assert(out.collect().toSeq == batch.collect().toSeq)
    // deterministic rerun (state rebuilt from scratch)
    val again = SparkEntry.queries("q44_stream_near_dedup")(spark, sf)
    assert(again.collect().toSeq == out.collect().toSeq)
  }

  test("q44 near-dedup state carries across micro-batches") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // lay the corpus out as 4 single-file slices (doc_id mod 4) so
    // maxFilesPerTrigger=1 yields 4 micro-batches; planted near-dup
    // pairs have adjacent ids, so pair members land in DIFFERENT
    // batches and a match requires state from an earlier trigger
    val tmp = Files.createTempDirectory("graft_q44_mb").toString
    try {
      val docs = Tables.documents(spark, sf)
      val nParts = 4
      for (i <- 0 until nParts) {
        val stage = s"$tmp/stage_$i"
        docs.filter(pmod(col("doc_id"), lit(nParts)) === i)
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath
        val dest = if (i == 0) s"$tmp/documents.parquet"
          else s"$tmp/documents_$i.parquet"
        Files.move(part, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
      }
      val out = graft.streaming.DocStream.streamNearDedup(spark, tmp,
        graft.queries.TextQueries.NgramTau, maxFilesPerTrigger = Some(1))
      val batch = SparkEntry.queries("d03_dedup_minhash_lsh")(spark, sf)
      assert(out.collect().toSeq == batch.collect().toSeq)
    } finally graft.streaming.Checkpoints.deleteRecursively(tmp)
  }

  test("q50 quality screen at ingest equals batch t14 across micro-batches") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // 4 single-file slices -> 4 micro-batches with maxFilesPerTrigger=1;
    // the frozen LM is trained on the whole corpus, so per-batch
    // scoring must still reproduce the batch result exactly
    val tmp = Files.createTempDirectory("graft_q50_mb").toString
    try {
      val docs = Tables.documents(spark, sf)
      val nParts = 4
      for (i <- 0 until nParts) {
        val stage = s"$tmp/stage_$i"
        docs.filter(pmod(col("doc_id"), lit(nParts)) === i)
          .coalesce(1).write.parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath
        val dest = if (i == 0) s"$tmp/documents.parquet"
          else s"$tmp/documents_$i.parquet"
        Files.move(part, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
      }
      // the model trains on documents.parquet (the first slice) in
      // the sliced layout — so compare against batch scoring of the
      // full stream corpus against THAT model, proving exactly the
      // frozen-model + batching-independence contract
      val sliceModel = graft.operators.TextAnalysis
        .ngramCounts(spark.read.parquet(s"$tmp/documents.parquet"))
        .localCheckpoint(true)
      val streamed = graft.streaming.DocStream
        .streamQualityScreen(spark, tmp, maxFilesPerTrigger = Some(1))
        .collect().map(_.toSeq).toSet
      val batch = graft.operators.TextAnalysis
        .ngramLmScoreAgainst(docs, sliceModel)
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally graft.streaming.Checkpoints.deleteRecursively(tmp)

    // and over the driver layout (one file == one batch): q50 == t14
    val q50 = SparkEntry.queries("q50_stream_quality")(spark, sf)
      .collect().map(_.toSeq).toSet
    val t14 = SparkEntry.queries("t14_ngram_lm")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(q50 == t14)
  }

  test("q40 stream-stream interval join equals the batch range join") {
    val out = SparkEntry.queries("q40_stream_stream_join")(spark, sf)
      .collect()
    val evRaw = Tables.events(spark, sf)
    val ev = evRaw.select(col("user_id"),
      col("event_id"), EventTime.tsUs(evRaw).as("us"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("us").as("cus"))
    val want = ev.filter(col("event_type") === "error")
      .join(clicks, col("user_id") === col("cu") &&
        col("cus") > col("us") - 1800L * 1000000L && col("cus") <= col("us"))
      .select(col("event_id").as("error_id"), col("click_id"),
        col("us").as("error_us"), col("cus").as("click_us"))
      .orderBy("error_id", "click_id").collect()
    assert(out.toSeq == want.toSeq)
    // pair count cross-checks a09's per-error counts
    val a09Sum = SparkEntry.queries("a09_range_join")(spark, sf)
      .agg(sum("n_clicks")).head().getLong(0)
    assert(out.length.toLong == a09Sum)
  }

  test("q38 stream-static enrichment equals the batch join rollup") {
    val out = SparkEntry.queries("q38_stream_enrich")(spark, sf)
    val evRaw = Tables.events(spark, sf)
    val batch = evRaw
      .withColumn("event_time", EventTime.eventTime(evRaw))
      .join(Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(unix_timestamp(date_trunc("hour", col("event_time")))
        .as("hour_start"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy("hour_start", "segment")
    assert(out.collect().toSeq == batch.collect().toSeq)
  }
}
