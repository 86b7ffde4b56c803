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
        def sample(): (Boolean, Double, Long) = {
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
        val base = (1 to runs).map(_ => sample())
        // adaptive extra sample: when the walls of a query disagree by
        // >1.5x within ONE window (GC/page-cache contention landing on
        // a run), a min-of-2 still carries the noise — one more draw
        // tightens the min at a cost only the noisy queries pay.
        // The per-query spread (max/min) is recorded in bench.json so
        // cross-window readers can discount noisy readings directly.
        // a failed EXTRA draw is dropped, not recorded: the adaptive
        // sample exists purely to tighten a noisy min, and a transient
        // failure on that draw must not flip a query whose base runs
        // both passed from pass to err (a stricter bar applied only to
        // the noisy queries)
        val samples =
          if (base.forall(_._1) && base.nonEmpty &&
              base.map(_._2).max > 1.5 * base.map(_._2).min) {
            val extra = sample()
            if (extra._1) base :+ extra else base
          } else base
        System.err.println(s"bench $name runs=" +
          samples.map(s => f"${s._2}%.2f").mkString(",") +
          " gcMs=" + samples.map(_._3).mkString(","))
        // report the min-wall sample AND its gc time: a contended
        // window shows up as gc-heavy walls, so carrying gc in the
        // record lets the reader discount it (r10's 6-7 s q06/q07
        // readings would have been self-diagnosing)
        name -> (if (samples.forall(_._1)) {
          val best = samples.minBy(_._2)
          val walls = samples.map(_._2)
          Right((best._1, best._2, best._3, walls.max / walls.min))
        } else Left("err"))
      }
    // The driver records only the LAST 2,000 chars of stdout, and the
    // 102 full query names alone are ~1.7 KB — a full-name one-liner
    // CANNOT fit (r10/r11 both lost their queries maps to exactly this
    // truncation). So the official record is split three ways:
    //   - target/bench.json: the COMPLETE record (full names, 3-decimal
    //     walls, per-query gc_ms, cpus) — survives any capture window;
    //   - stderr: the same complete record, for interactive runs;
    //   - stdout: ONE final compact line, ~1.3 KB at 102 queries, keyed
    //     by each query's unique pre-underscore code (q19 =
    //     q19_graph_search, d09 = d09_segment_dedup, ...; suite codes
    //     are unique by construction and asserted below). Nothing else
    //     is ever printed to stdout, so the captured tail IS the line.
    def fmt(v: Double): String = f"$v%.3f"
    def fmt2(v: Double): String = f"$v%.2f"
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    // collision would silently merge two timings; full names still fit
    // nothing, so fail loudly instead
    require(shortKeys.distinct.length == shortKeys.length,
      "non-unique short query codes: " + shortKeys.diff(shortKeys.distinct))
    val qsShort = shortKeys.zip(results).map {
      case (sk, (_, Right((_, w, _, _)))) => s"\"" + sk + "\":" + fmt2(w)
      case (sk, (_, Left(_)))             => s"\"" + sk + "\":\"err\""
    }.mkString("{", ",", "}")
    val qsFull = results.map {
      case (k, Right((_, w, _, _))) => s"\"" + k + "\":" + fmt(w)
      case (k, Left(_))             => s"\"" + k + "\":\"err\""
    }.mkString("{", ",", "}")
    val gcs = results.collect {
      case (k, Right((_, _, gc, _))) => s"\"" + k + "\":" + gc
    }.mkString("{", ",", "}")
    val spreads = results.collect {
      case (k, Right((_, _, _, sp))) => s"\"" + k + "\":" + fmt2(sp)
    }.mkString("{", ",", "}")
    val good = results.collect { case (_, Right((_, w, _, _))) => w }
    val failed = results.count(_._2.isLeft)
    val total = if (good.nonEmpty) good.sum else 0.0
    val fullRecord = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","cpus":${GraftSession.cpus},"queries":$qsFull,"gc_ms":$gcs,"spread":$spreads,"failed":$failed,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench.json"), fullRecord + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write target/bench.json: $e")
    }
    System.err.println(fullRecord)
    // window-quality summary for the DRIVER-captured line (the full
    // per-query spread map lives in target/bench.json; it cannot fit
    // the 1900-char stdout budget): median and max of the per-query
    // max/min wall ratios plus the count of noisy (>1.5x) queries.
    // A loaded window reads as a high median across mostly-untouched
    // queries — the r15 +23% driver-window drift would have been
    // self-documenting with this field in the record.
    val spreadVals = results.collect {
      case (_, Right((_, _, _, sp))) => sp }.sorted
    val spreadSummary = if (spreadVals.isEmpty) "" else {
      val med = spreadVals(spreadVals.length / 2)
      s""","spread_med":${fmt2(med)},"spread_max":${fmt2(spreadVals.last)},"noisy":${spreadVals.count(_ > 1.5)}"""
    }
    val line = s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","cpus":${GraftSession.cpus},"queries":$qsShort$spreadSummary,"failed":$failed,"sf":"$sfDir"}"""
    if (line.length > 1900) // belt-and-braces: never regress the record
      System.err.println(s"bench: WARNING final line ${line.length} chars " +
        "exceeds the 1900 budget; the driver tail-capture may truncate it")
    println(line)
    spark.stop()
    // a nonzero failure count is a broken engine, not a fast one
    if (failed > 0) sys.exit(1)
  }
}
