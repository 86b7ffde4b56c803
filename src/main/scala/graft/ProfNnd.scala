package graft
import org.apache.spark.sql.functions._
import graft.datagen.DataGen
/** Temporary: apportion graph_nnd_build's wall — base NN-descent vs
  * upper layers; also dump the reverse-degree distribution after each
  * iteration (hub hypothesis: Σ_mid deg² blows up the candidate set).
  */
object ProfNnd {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val spark = GraftSession.create(appName = "prof-nnd")
    val corpus = DataGen.randomFloat(spark, n, 64, centers = 32, seed = 7)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    corpus.cache().count()
    var t0 = System.nanoTime()
    val g = graft.operators.NnDescent.build(corpus,
      graft.queries.IndexQueries.GraphDeg,
      graft.queries.IndexQueries.NndIters, 1, nKnown = n)
    println(f"BASE_NND rows=${g.count()} ${(System.nanoTime()-t0)/1e9}%.1f s")
    // reverse-degree distribution of the final graph
    val deg = g.groupBy("neighbor_id").count()
    deg.select(max("count"), expr("percentile(count, 0.999)"),
      expr("percentile(count, 0.99)"), avg("count")).show(false)
    spark.stop()
  }
}
