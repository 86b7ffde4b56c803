package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.EventTime

/** Structured Streaming ingest path — the continuous-insert side of
  * the reference's mutation workload run as micro-batches with event-
  * time windows + watermark (bounded state at any corpus size).
  * For verification the finite events table drives the stream with
  * Trigger.AvailableNow into a memory sink.
  *
  * MEMORY-SINK INVENTORY (the staging rule): a memory sink is a
  * DRIVER-RESIDENT result table, so it is allowed here only where
  * the query's OUTPUT cardinality is aggregate/join-bounded — the
  * result of a groupBy, a latest-wins merge, or an interval join,
  * never the re-emitted stream itself. Any future streaming entry
  * whose output grows with the stream must take the q43 file-sink
  * path ([[hourlyAggFileSink]] — parquet out, nothing on the
  * driver). Current sinks and their bounds (StreamingSinkSpec pins
  * this list and the bounds):
  *
  *  - [[hourlyAgg]] (q31): groupBy(type, 1h window) — rows ≤
  *    |types| × |windows in the event-time span|.
  *  - [[streamDedup]] (q33): per-key aggregate over the dedup key —
  *    rows ≤ |distinct keys|, itself watermark-bounded state.
  *  - [[streamUpsert]] (q34): latest-wins merge — rows ≤ |distinct
  *    ids touched|.
  *  - [[enrichedHourlyAgg]] (q38): dimension join then rollup —
  *    rows ≤ |regions| × |windows|.
  *  - [[streamStreamJoin]] (q40): two-sided interval join — rows =
  *    matched (error, click) pairs inside the ±interval band; the
  *    band and both watermarks bound state AND output rate.
  *  - [[sessionWindows]] (q32): session_window aggregate — rows ≤
  *    sessions = gap-separated runs, ≤ |events| but emitted as
  *    per-session aggregates (one row per closed session).
  *  - DocStream.streamNearDedup (q44): LSH-bucket match pairs —
  *    rows ≤ near-duplicate pairs found, state LSH-keyed.
  *
  * (ProfStream's diagnostic sink was retired with the r17 tools tidy.)
  */
object EventStream {
  private val nameCounter = new AtomicInteger(0)

  /** State-partition count for a stateful streaming query over the
    * parquet source at `path`. Spark fixes the streaming state layout
    * at query start (state stores cannot be re-partitioned by AQE),
    * so size it from the source's plan-stats footprint the same way
    * t11 auto-sizes its pack buckets: one state partition per ~64 MB
    * of source, capped at 4096 — at 100 TB/day the byte term picks
    * the count; state volume, not a constant, must size the layout.
    *
    * `floor` is the gate-scale (bytes « 64 MB·cores) knob. History,
    * because the right value has MOVED with the code: r15 measured
    * the single-store entries (windowed aggs, dropDuplicates,
    * flatMapGroupsWithState) parallelism-bound (q34 3.42 s floored
    * at 8 vs 1.25 s at the 32-partition default) and the multi-store/
    * heavy-commit entries (q40's 4-store join, q38's complete-mode
    * rewrite, q43's per-flush file commits) commit-bound → split
    * floors. Re-measured in r17 (same box, 32 cores, warm JVM,
    * floor 8 vs floor 32 at sf0.1): EVERY stateful entry is now
    * commit-bound at gate scale — q32 2.0-2.4 vs 3.1-3.2 s,
    * q33 1.5-1.7 vs 2.1-2.2, q34 1.6-2.3 vs 2.0-2.1, q31 1.4-1.6 vs
    * 1.7-1.9 — the r15 parallelism-bound regime no longer reproduces
    * (the stateful stages' per-row work shrank across rounds while
    * the per-partition commit constant did not). Floor 8 everywhere;
    * at 100 TB/day the byte term picks the count regardless.
    */
  private[streaming] def statePartitionsFor(
      spark: SparkSession, path: String, floor: Int): Int =
    sizePartitions(graft.Tables.parquetAt(spark, path)
      .queryExecution.optimizedPlan.stats.sizeInBytes, floor)

  /** The gate-scale state-partition floor (see [[statePartitionsFor]]
    * — r17 re-measured every stateful entry commit-bound).
    */
  private[streaming] def stateFloor: Int = 8

  /** [[statePartitionsFor]] over a directory + glob — the layout the
    * document stream reads (documents*.parquet slices, one per
    * micro-batch in the multi-batch spec), where sizing from the
    * first slice alone would undercount the corpus.
    */
  private[streaming] def statePartitionsForGlob(
      spark: SparkSession, dir: String, glob: String, floor: Int): Int =
    sizePartitions(spark.read
      .schema(graft.Tables.schemaAt(spark, s"$dir/$glob"))
      .option("pathGlobFilter", glob).parquet(dir)
      .queryExecution.optimizedPlan.stats.sizeInBytes, floor)

  private def sizePartitions(bytes: BigInt, floor: Int): Int =
    // floor first, cap last: the 4096 ceiling must bind even when the
    // floor itself is large (a cluster whose defaultParallelism
    // exceeds 4096 would otherwise smuggle the floor past the cap)
    (bytes / (64L << 20)).max(floor).min(4096).toInt

  /** Run `body` with spark.sql.shuffle.partitions = `n` (the knob
    * streaming state layout is taken from at query start), restoring
    * the session default after — batch entries on the shared session
    * keep their own sizing.
    */
  private[streaming] def withStatePartitions[T](spark: SparkSession, n: Int)
      (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n)
    try body finally spark.conf.set(key, prev)
  }

  /** Tumbling 1-hour window per event_type: count + value sum (in
    * integer cents, so results are order-independent and exact).
    */
  def hourlyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.Tables.schemaAt(spark, s"$sfDir/events.parquet")
    // the streaming file source wants a directory: stream the sf dir
    // with a glob that selects only the events table
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      // schema-adaptive: ts has shipped as both ns-Long and µs-NTZ
      .withColumn("event_time", EventTime.eventTime(schema))
    val agg = stream
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n_events"), col("value_cents"))
    val sink = s"graft_stream_${nameCounter.incrementAndGet()}"
    // state partitions sized from the source's byte footprint (see
    // statePartitionsFor): every stateful entry pays per-partition
    // store-commit cost each micro-batch, so the count must track
    // state volume, not the session's batch-shuffle default
    withStatePartitions(spark,
      statePartitionsFor(spark, s"$sfDir/events.parquet", stateFloor)) {
      Checkpoints.withEphemeral("graft_chk_") { chk =>
        val q = agg.writeStream
          .option("checkpointLocation", chk)
          .outputMode("complete")
          .format("memory")
          .queryName(sink)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.table(sink).orderBy("hour_start", "event_type")
  }

  /** q43: [[hourlyAgg]] routed through the PRODUCTION sink — the
    * append-mode parquet FILE sink (exactly-once via the sink's
    * commit log) plus batch read-back, instead of the memory-table
    * harness. Append emits each window once its end passes the
    * watermark (0s delay, q32's contract): AvailableNow's final
    * no-data micro-batch advances the watermark to the max event time
    * and flushes every closed hour; only the trailing open hour stays
    * in state — the oracle mirrors that with the same
    * window_end <= max(ts) predicate q32 gates on.
    */
  def hourlyAggFileSink(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.Tables.schemaAt(spark, s"$sfDir/events.parquet")
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("event_time", EventTime.eventTime(schema))
    val agg = stream
      .withWatermark("event_time", "0 seconds")
      .groupBy(window(col("event_time"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n_events"), col("value_cents"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_file_sink").toString
    // byte-driven state sizing, but floor 8 (pre-r17 note; now the shared stateFloor): the
    // parquet sink commits one FILE per non-empty partition per flush
    // (plus the sink-log entry), so at gate scale this entry is
    // commit/file-bound like q40, not parallelism-bound (same-window
    // A/B at sf0.1: 1.79 s at floor 8 vs 2.41 at defaultParallelism).
    // The byte term still governs at real scale, where it also bounds
    // the file count per window flush.
    withStatePartitions(spark,
      statePartitionsFor(spark, s"$sfDir/events.parquet", stateFloor)) {
      val q = agg.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/chk")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // the data dir must outlive this call (the returned DataFrame scans
    // it lazily); the commit-log/checkpoint side is done once the query
    // terminates
    Checkpoints.deleteRecursively(s"$out/chk")
    spark.read.parquet(s"$out/data").orderBy("hour_start", "event_type")
  }

  /** q33: streaming dedup — dropDuplicates on a semantic key with a
    * watermark bounding state (the exactly-once ingest guard). Output
    * is the distinct key set, which is order-independent and so
    * batch-reproducible.
    */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.Tables.schemaAt(spark, s"$sfDir/events.parquet")
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("event_time", EventTime.eventTime(schema))
      .withColumn("hour_start",
        unix_timestamp(date_trunc("hour", col("event_time"))))
    val deduped = stream
      .withWatermark("event_time", "1 hour")
      .dropDuplicates("user_id", "event_type", "hour_start")
      .select("user_id", "event_type", "hour_start")
    val sink = s"graft_dedup_${nameCounter.incrementAndGet()}"
    withStatePartitions(spark,
      statePartitionsFor(spark, s"$sfDir/events.parquet", stateFloor)) {
    Checkpoints.withEphemeral("graft_chk_") { chk =>
      val q = deduped.writeStream
        .option("checkpointLocation", chk)
        .outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    }
    spark.table(sink).orderBy("user_id", "event_type", "hour_start")
  }

  /** q34: streaming CRUD upsert-merge with *custom* state —
    * flatMapGroupsWithState keeps the latest-(ts, event_id) event per
    * user (the reference's insert/update/delete mutation surface,
    * base/module.py:140-180, as a continuous stream); 'error' events
    * act as delete tombstones. Each micro-batch emits the winner-so-
    * far, so the post-stream latest-wins reduction gives the same
    * final collection under ANY batching — which is what makes a
    * stateful streaming query batch-reproducible and oracle-checkable.
    * State is one small tuple per live key (bounded by the key space,
    * the 100 TB contract for keyed state).
    */
  def streamUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val schema = graft.Tables.schemaAt(spark, s"$sfDir/events.parquet")
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id"), EventTime.tsUs(schema).as("ts_us"),
        col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .as[(Long, Long, Long, String, Long)]
    val merged = stream.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String, Long),
        (Long, Long, Long, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String, Long)],
         state: GroupState[(Long, Long, String, Long)]) =>
          var best = state.getOption
          rows.foreach { r =>
            val cand = (r._2, r._3, r._4, r._5)
            if (best.isEmpty || cand._1 > best.get._1 ||
                (cand._1 == best.get._1 && cand._2 > best.get._2))
              best = Some(cand)
          }
          state.update(best.get)
          Iterator.single((uid, best.get._1, best.get._2, best.get._3,
            best.get._4))
      }
      .toDF("user_id", "ts_us", "event_id", "event_type", "value_cents")
    val sink = s"graft_upsert_${nameCounter.incrementAndGet()}"
    withStatePartitions(spark,
      statePartitionsFor(spark, s"$sfDir/events.parquet", stateFloor)) {
    Checkpoints.withEphemeral("graft_chk_") { chk =>
      val q = merged.writeStream
        .option("checkpointLocation", chk)
        .outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    }
    // latest-wins across the per-batch emissions (struct max orders by
    // (ts_us, event_id) — unique, so deterministic); tombstoned keys
    // leave the collection
    spark.table(sink)
      .groupBy("user_id")
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"),
        col("value_cents"))).as("w"))
      .select(col("user_id"), col("w.ts_us").as("ts_us"),
        col("w.event_id").as("event_id"),
        col("w.event_type").as("event_type"),
        col("w.value_cents").as("value_cents"))
      .filter(col("event_type") =!= "error")
      .orderBy("user_id")
  }

  /** q38: stream-static enrichment — the standard streaming-ETL shape
    * where each event is decorated with dimension attributes before
    * aggregation. No hard broadcast hint on the static side: customer
    * SCALES with the dataset (150k rows per TPC-H SF), so the planner
    * must stay free to pick a shuffled stream-static join when the
    * dim outgrows the broadcast limit; under the threshold (every
    * local SF) size-based planning still broadcasts it per
    * micro-batch. Stream-static inner joins are stateless either way
    * — no join state accumulates, the 100 TB contract. Enriched
    * events roll up into hourly windows per market segment;
    * integer-cent sums keep the result order-independent and
    * batch-reproducible.
    */
  def enrichedHourlyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.Tables.schemaAt(spark, s"$sfDir/events.parquet")
    val dim = graft.Tables.parquetAt(spark, s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("event_time", EventTime.eventTime(schema))
      .join(dim, col("user_id") === col("c_custkey"))
    val agg = stream
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour").as("w"),
        col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("c_mktsegment").as("segment"), col("n_events"), col("value_cents"))
    val sink = s"graft_enrich_${nameCounter.incrementAndGet()}"
    // floor 8 (pre-r17 note; now the shared stateFloor): single-store but COMPLETE
    // mode — every commit rewrites the whole per-partition result into
    // the sink, so like q40's multi-store join it is commit-bound at
    // gate scale, not parallelism-bound (same-window A/B at sf0.1:
    // 1.37 s at floor 8 vs 1.73 at defaultParallelism). The byte term
    // still governs at real scale.
    withStatePartitions(spark,
      statePartitionsFor(spark, s"$sfDir/events.parquet", stateFloor)) {
    Checkpoints.withEphemeral("graft_chk_") { chk =>
      val q = agg.writeStream
        .option("checkpointLocation", chk)
        .outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    }
    spark.table(sink).orderBy("hour_start", "segment")
  }

  /** q40: stream-STREAM interval join — errors joined to the same
    * user's clicks within the preceding 30 minutes, both sides live
    * streams (the click stream is hot state the error stream probes).
    * Unlike q38's stream-static join this one keeps join state: the
    * watermark plus the two-sided time-bound condition let Spark
    * evict clicks older than the interval, so state is bounded by
    * 30 minutes of clicks regardless of how long the streams run —
    * the stream-stream contract at 100 TB/day. Inner interval joins
    * emit each qualifying pair exactly once under any micro-batching,
    * which is what makes the query batch-reproducible and
    * oracle-checkable against the equivalent batch range join (a09's
    * pair set).
    */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.Tables.schemaAt(spark, s"$sfDir/events.parquet")
    // ONE streaming source split by filter into the two sides (a
    // streaming self-join): both sides share a single
    // FileStreamSource, so each micro-batch lists and admits the
    // input files once instead of once per side — two independent
    // src() instances each re-list and re-scan the directory per
    // batch, which at AvailableNow single-batch replay doubled the
    // wall. Each side still carries its OWN watermark on its own
    // event-time column (Spark's multi-watermark min policy).
    val ev = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("event_time", EventTime.eventTime(schema))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        col("event_time").as("error_time"))
      .withWatermark("error_time", "1 hour")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", "1 hour")
    val joined = errors.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_time") > col("error_time") - expr("INTERVAL 30 MINUTES") &&
          col("click_time") <= col("error_time"))
      .select(col("error_id"), col("click_id"),
        unix_micros(col("error_time")).as("error_us"),
        unix_micros(col("click_time")).as("click_us"))
    val sink = s"graft_ssjoin_${nameCounter.incrementAndGet()}"
    // floor 8 (pre-r17 note; now the shared stateFloor): the interval join keeps 4 state stores
    // per partition, so the commit constant dominates at gate scale
    // (measured 5.4 s at 32 partitions vs 2.1 s at 8)
    val parts = statePartitionsFor(spark, s"$sfDir/events.parquet", stateFloor)
    withStatePartitions(spark, parts) {
      Checkpoints.withEphemeral("graft_chk_") { chk =>
        val q = joined.writeStream
          .option("checkpointLocation", chk)
          .outputMode("append")
          .format("memory")
          .queryName(sink)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.table(sink).orderBy("error_id", "click_id")
  }

  /** q32: true stateful streaming sessionization via session_window
    * (30 min gap) + watermark. Append mode emits exactly the CLOSED
    * sessions — those whose (last event + gap) precedes the final
    * watermark (= max event time at 0s delay; the no-data final
    * micro-batch flushes them). That closed set is deterministic and
    * batch-reproducible, so it oracle-checks.
    */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = graft.Tables.schemaAt(spark, s"$sfDir/events.parquet")
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("event_time", EventTime.eventTime(schema))
    val agg = stream
      .withWatermark("event_time", "0 seconds")
      .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("user_id"), col("n_events"))
    val sink = s"graft_sessions_${nameCounter.incrementAndGet()}"
    withStatePartitions(spark,
      statePartitionsFor(spark, s"$sfDir/events.parquet", stateFloor)) {
    Checkpoints.withEphemeral("graft_chk_") { chk =>
      val q = agg.writeStream
        .option("checkpointLocation", chk)
        .outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    }
    spark.table(sink).orderBy("user_id", "start_us")
  }
}
