package graft.tools

import graft.{GraftSession, SparkEntry}

/** Optimization-round diagnostic: run the declared queries in bench
  * order up to (and including) the query whose name starts with
  * args(0), printing after each one the JVM/storage state — cached
  * RDD count, storage memory/disk bytes, and heap in use. Built to
  * answer "does driver-resident state accumulated across the bench
  * slow the late queries?" (round-17 verdict item 2). Measurement
  * tooling only; never on a query path.
  *
  * Usage: runMain graft.tools.MemProbe <stopPrefix> [runsPerQuery]
  */
object MemProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MemProbe <stopPrefix> [runs]")
    val stop = args(0)
    val runs = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(appName = "graft-memprobe")
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    val upTo = names.indexWhere(_._1.startsWith(stop))
    require(upTo >= 0, s"no query starts with '$stop'")
    names.take(upTo + 1).foreach { case (name, fn) =>
      val walls = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum / 1e6
      val disk = infos.map(_.diskSize).sum / 1e6
      val rt = Runtime.getRuntime
      val heap = (rt.totalMemory - rt.freeMemory) / 1e6
      println(f"$name%-32s wall=${walls.min}%6.2f (" +
        walls.map(w => f"$w%.2f").mkString(",") +
        f") rdds=${infos.length}%4d storMem=$mem%8.1fMB " +
        f"storDisk=$disk%8.1fMB heapUsed=$heap%8.1fMB")
    }
    spark.stop()
  }
}
