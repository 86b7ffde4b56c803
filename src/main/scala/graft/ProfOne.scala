package graft
object ProfOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(appName = "prof")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args(0)
    // `ProfOne <query> explain` prints the formatted physical plan
    // instead of timing — the per-operator plan-audit tool
    if (args.length > 1 && args(1) == "explain") {
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    } else {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(s"RUN $r $name rows=$n t=${(System.nanoTime() - t0) / 1e9}")
      }
    }
    spark.stop()
  }
}
