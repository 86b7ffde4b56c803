package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming ingest path — the continuous-insert side of
  * the reference's mutation workload run as micro-batches with event-
  * time windows + watermark (bounded state at any corpus size).
  * For verification the finite events table drives the stream with
  * Trigger.AvailableNow into a memory sink.
  */
object EventStream {
  private val nameCounter = new AtomicInteger(0)

  /** Tumbling 1-hour window per event_type: count + value sum (in
    * integer cents, so results are order-independent and exact).
    */
  def hourlyAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the streaming file source wants a directory: stream the sf dir
    // with a glob that selects only the events table
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      // ts is Long ns (nanosAsLong): derive a proper event-time col
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
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
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink).orderBy("hour_start", "event_type")
  }

  /** q33: streaming dedup — dropDuplicates on a semantic key with a
    * watermark bounding state (the exactly-once ingest guard). Output
    * is the distinct key set, which is order-independent and so
    * batch-reproducible.
    */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withColumn("hour_start",
        unix_timestamp(date_trunc("hour", col("event_time"))))
    val deduped = stream
      .withWatermark("event_time", "1 hour")
      .dropDuplicates("user_id", "event_type", "hour_start")
      .select("user_id", "event_type", "hour_start")
    val sink = s"graft_dedup_${nameCounter.incrementAndGet()}"
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink).orderBy("user_id", "event_type", "hour_start")
  }

  /** q32: true stateful streaming sessionization via session_window
    * (30 min gap) + watermark. Append mode emits exactly the CLOSED
    * sessions — those whose (last event + gap) precedes the final
    * watermark (= max event time at 0s delay; the no-data final
    * micro-batch flushes them). That closed set is deterministic and
    * batch-reproducible, so it oracle-checks.
    */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .withWatermark("event_time", "0 seconds")
      .groupBy(session_window(col("event_time"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("user_id"), col("n_events"))
    val sink = s"graft_sessions_${nameCounter.incrementAndGet()}"
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink).orderBy("user_id", "start_us")
  }
}
