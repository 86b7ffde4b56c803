package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Optimization-round profiler: run one declared query end-to-end
  * (`.count()`, the bench action) `runs` times and print a per-JOB
  * wall breakdown from a SparkListener — the "which of this query's
  * N sequential jobs is the expensive one" view the Spark UI would
  * give, usable headless. Measurement tooling only; never on a query
  * path.
  *
  * Usage: runMain graft.tools.ProfQuery <queryName> [runs]
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfQuery <queryName> [runs]")
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(appName = s"graft-prof-$name")
    val fn = SparkEntry.queries(name)

    final case class JobRec(id: Int, desc: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    // stage -> job via the job's declared stageIds: concurrent /
    // overlapping jobs (streaming entries, AQE subqueries) would be
    // misattributed by any "first unfinished job" heuristic
    val stageToJob = mutable.HashMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = JobRec(e.jobId, d.take(100), e.time)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1; j.tasks += e.stageInfo.numTasks
          }
        }
    })

    // streaming entries: print Spark's own per-batch duration
    // breakdown (triggerExecution / queryPlanning / stateCommit ...)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit =
          println(s"  stream ${e.name} started")
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          println(s"  stream batch ${e.progress.batchId} durationMs=" +
            e.progress.durationMs)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })

    (1 to runs).foreach { r =>
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== run $r: $name rows=$n wall=$wall%.3f s ==")
      jobs.synchronized {
        jobs.values.foreach { j =>
          val w = (j.end - j.start) / 1e3
          println(f"  job ${j.id}%3d ${w}%8.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc}")
        }
        val sum = jobs.values.map(j => (j.end - j.start) / 1e3).sum
        println(f"  jobs=${jobs.size} sum=${sum}%.3f s (gap=${wall - sum}%.3f s driver-side)")
      }
    }
    spark.stop()
  }
}
