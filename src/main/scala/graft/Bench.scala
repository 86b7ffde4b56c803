package graft
import scala.jdk.CollectionConverters._
object Bench {
  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(appName = "graft-bench")
    // reference methodology (run.py --runs, default 5): execute each
    // query multiple times, report the best — index builds (cached
    // after the first run) and JIT/codegen warm-up amortise out
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    // --filter sub1,sub2 (or SPARK_GRAFT_BENCH_FILTER): run only the
    // queries whose name contains a listed substring — the isolation
    // tool for per-query diagnosis (regressions measured inside the
    // full 60-query JVM confound the query with its neighbours'
    // GC/page-cache pressure)
    val filterArg = args.sliding(2).collectFirst {
      case Array("--filter", f) => f
    }.orElse(sys.env.get("SPARK_GRAFT_BENCH_FILTER"))
    val keep: String => Boolean = filterArg match {
      case Some(f) =>
        val subs = f.split(",").map(_.trim).filter(_.nonEmpty)
        name => subs.exists(name.contains)
      case None => _ => true
    }
    // sorted order: stable round-to-round comparisons; the first
    // query otherwise varies with Map hashing and silently absorbs
    // JVM/session warm-up
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => keep(name) }
      .map { case (name, fn) =>
        // a query that throws must surface as an explicit "err", never
        // as its (near-zero) failure wall — a broken query once
        // "benched" at 0.076 s for two rounds because a catch-all here
        // turned the analysis-exception wall into a min-of-2 sample
        val samples = (1 to runs).map { _ =>
          val gc0 = gcMillis()
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"bench $name FAILED: " +
                s"${e.getClass.getName}: ${e.getMessage}")
              false
            }
          (ok, (System.nanoTime() - t0) / 1e9, gcMillis() - gc0)
        }
        System.err.println(s"bench $name runs=" +
          samples.map(s => f"${s._2}%.2f").mkString(",") +
          " gcMs=" + samples.map(_._3).mkString(","))
        // report the min-wall sample AND its gc time: a contended
        // window shows up as gc-heavy walls, so carrying gc in the
        // record lets the reader discount it (r10's 6-7 s q06/q07
        // readings would have been self-diagnosing)
        name -> (if (samples.forall(_._1)) Right(samples.minBy(_._2))
                 else Left("err"))
      }
    // 3-decimal (ms) precision keeps the one-line JSON short enough to
    // survive the driver's output-tail capture intact
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map {
      case (k, Right((_, w, _))) => s"\"" + k + "\":" + fmt(w)
      case (k, Left(_))          => s"\"" + k + "\":\"err\""
    }.mkString("{", ",", "}")
    val gcs = results.collect {
      case (k, Right((_, _, gc))) => s"\"" + k + "\":" + gc
    }.mkString("{", ",", "}")
    val good = results.collect { case (_, Right((_, w, _))) => w }
    val failed = results.count(_._2.isLeft)
    val total = if (good.nonEmpty) good.sum else 0.0
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","cpus":${GraftSession.cpus},"queries":$qs,"gc_ms":$gcs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    // a nonzero failure count is a broken engine, not a fast one
    if (failed > 0) sys.exit(1)
  }
}
