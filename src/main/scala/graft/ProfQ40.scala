package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic: per-micro-batch progress for the q40 stream-stream
  * interval join (durationMs breakdown — where a tiny-state join
  * spends its wall).
  */
object ProfQ40 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(appName = "prof-q40")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        System.err.println(s"PROGRESS batch=${e.progress.batchId} " +
          s"rows=${e.progress.numInputRows} durationMs=${e.progress.durationMs} " +
          s"stateRows=${Option(e.progress.stateOperators).map(_.map(_.numRowsTotal).sum)}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    (1 to args.headOption.map(_.toInt).getOrElse(2)).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.streaming.EventStream.streamStreamJoin(spark, sfDir).count()
      System.err.println(f"RUN $i wall=${(System.nanoTime() - t0) / 1e9}%.2f rows=$n")
    }
    spark.stop()
  }
}
