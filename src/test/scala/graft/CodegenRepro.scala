package graft

// Temporary review reproduction: run every query with codegen fallback
// disabled so any generated-code compile failure surfaces as an error.
object CodegenRepro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.create(appName = "codegen-repro")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val bad = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, sfDir).count(); println(s"OK   $name") }
      catch { case e: Throwable =>
        val root = {
          var c: Throwable = e
          while (c.getCause != null) c = c.getCause
          c
        }
        bad += name -> s"${root.getClass.getSimpleName}: ${String.valueOf(root.getMessage).take(400)}"
        println(s"FAIL $name")
      }
    }
    println("==== FAILURES ====")
    bad.foreach { case (n, m) => println(s"$n :: $m") }
    spark.stop()
  }
}
