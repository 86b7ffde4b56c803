package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(appName = "graft-bench")
    // reference methodology (run.py --runs, default 5): execute each
    // query multiple times, report the best — index builds (cached
    // after the first run) and JIT/codegen warm-up amortise out
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    // sorted order: stable round-to-round comparisons; the first
    // query otherwise varies with Map hashing and silently absorbs
    // JVM/session warm-up
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(s"bench $name runs=" +
        times.map(t => f"$t%.2f").mkString(","))
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
