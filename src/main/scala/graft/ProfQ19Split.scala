package graft
import org.apache.spark.sql.functions._
import graft.operators.{GraphSearch, VecMetric}
import graft.queries.{IndexQueries => IQ, Split}
/** Temporary: split q19's bench wall into build vs search at sf0.1. */
object ProfQ19Split {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(appName = "prof-q19-split")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(Split.isTrain(col("vec_id")))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(Split.isQuery(col("vec_id"), 10))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val lv = IQ.levelsFor(base.count())
    var t0 = System.nanoTime()
    val p = java.nio.file.Files.createTempDirectory("graft_q19_prof").toString
    GraphSearch.buildLayeredGraphs(base, lv, IQ.GraphDeg, IQ.UpperDeg,
      VecMetric.Euclidean)
      .write.mode("overwrite").partitionBy("layer").parquet(p)
    println(f"BUILD ${(System.nanoTime()-t0)/1e9}%.2f s (levels=$lv)")
    for (r <- 1 to 2) {
      t0 = System.nanoTime()
      val n = GraphSearch.hierarchicalSearch(base, spark.read.parquet(p),
        queries, 10, IQ.HierBeam, IQ.HierRounds, lv, IQ.UpperBeam).count()
      println(f"SEARCH$r rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
