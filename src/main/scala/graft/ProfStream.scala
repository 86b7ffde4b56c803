package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Checkpoints

/** Diagnostic harness for the streaming micro-batch overhead: runs
  * the q31 aggregation shape N times under each checkpoint strategy
  * (explicit tmpfs dir vs Spark-managed temp) in ONE JVM, interleaved,
  * so JIT/page-cache warm-up cancels out. Prints per-run wall + GC.
  */
object ProfStream {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(appName = "prof-stream")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = args.headOption.map(_.toInt).getOrElse(6)
    var c = 0
    def once(mode: String): Double = {
      c += 1
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .withColumn("event_time", EventTime.eventTime(schema))
      val agg = stream
        .withWatermark("event_time", "1 hour")
        .groupBy(window(col("event_time"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val sink = s"prof_sink_$c"
      val t0 = System.nanoTime()
      val gc0 = gcMillis()
      val w0 = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(Trigger.AvailableNow())
      val q = mode match {
        case "tmpfs" =>
          Checkpoints.withEphemeral("prof_chk_") { chk =>
            val q = w0.option("checkpointLocation", chk).start()
            q.awaitTermination(); q
          }
        case "managed" =>
          val q = w0.start(); q.awaitTermination(); q
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"prof mode=$mode%-8s run=$c t=$dt%.2f gcMs=${gcMillis() - gc0}")
      spark.catalog.dropTempView(sink)
      dt
    }
    val modes = Seq("tmpfs", "managed")
    val res = (1 to runs).flatMap(_ => modes.map(m => m -> once(m)))
      .groupBy(_._1).view.mapValues(ts => ts.map(_._2).drop(1))
    res.toSeq.sortBy(_._1).foreach { case (m, ts) =>
      println(f"MODE $m%-8s min=${ts.min}%.2f med=${ts.sorted.apply(ts.size / 2)}%.2f")
    }
    spark.stop()
  }
}
