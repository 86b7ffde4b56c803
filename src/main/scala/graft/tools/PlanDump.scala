package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.{GraftSession, SparkEntry}

/** Optimization-round tooling: dump `.explain("formatted")` for every
  * declared query (or a --filter subset) to a directory of
  * `<query>_<suffix>.txt` files. The judge reads these against the
  * code's plan claims (OPTIMIZATION_r17.md), so the dump is the plan
  * AS DECLARED (pre-execution, `AdaptiveSparkPlan isFinalPlan=false`)
  * — the same thing `df.explain("formatted")` prints.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [--filter a,b]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r17"
    val suffix = if (args.length > 1) args(1) else "before"
    val filter = args.sliding(2).collectFirst {
      case Array("--filter", f) => f.split(",").map(_.trim).toSeq
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(appName = "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.exists(n.contains)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(mode)
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
          System.err.println(s"plandump: $name ok (${plan.length} chars)")
        } catch {
          case e: Throwable =>
            System.err.println(s"plandump: $name FAILED ${e.getClass.getName}: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
