package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphSearch, KnnSearch, VecMetric}
import graft.queries.{IndexQueries => IQ, Split}

/** One-off tuning grid for the q19 hierarchy constants: prints
  * recall@10 / avg visited for the flat r7 config and a grid of
  * (upperBeam, beam, rounds) hierarchy configs at sf0.01.
  */
object ProfGraph {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(appName = "prof-graph")
    val sf = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter(Split.isTrain(col("vec_id")))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .localCheckpoint(true)
    val queries = emb.filter(Split.isQuery(col("vec_id"), 10))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val flatGraph = KnnSearch.bruteForceBlocked(base,
      base.select(col("id").as("query_id"), col("vec").as("qvec")),
      IQ.GraphDeg, VecMetric.Euclidean,
      pairFilter = Some(col("id") =!= col("query_id")))
      .select(col("query_id").as("id"), col("neighbor_id"))
      .localCheckpoint(true)
    val exact = KnnSearch.bruteForce(base, queries, 10, VecMetric.Euclidean)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val nEx = exact.count().toDouble
    def eval(topk: org.apache.spark.sql.DataFrame,
        vis: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = topk.select("query_id", "neighbor_id")
        .intersect(exact).count().toDouble / nEx
      (r, vis.agg(avg("n_visited")).head().getDouble(0))
    }
    val (fr, fv) = { val (t, v) = GraphSearch.beamSearchWithVisited(base,
      flatGraph, queries, 10, IQ.Beam, IQ.BeamRounds, 16,
      VecMetric.Euclidean, IQ.EntryBeam); eval(t, v) }
    println(f"FLAT   beam=${IQ.Beam} rounds=${IQ.BeamRounds} recall=$fr%.3f visited=$fv%.1f")
    for (upperDeg <- Seq(6); layers <- Seq(5)) {
      val stack = GraphSearch.buildLayeredGraphs(base, layers, IQ.GraphDeg,
        upperDeg, VecMetric.Euclidean).localCheckpoint(true)
      for (ub <- Seq(3, 4); beam <- Seq(8); rounds <- Seq(3)) {
        val (t, v) = GraphSearch.hierarchicalSearchWithVisited(base, stack,
          queries, 10, beam, rounds, layers, ub)
        val (r, vis) = eval(t, v)
        println(f"HIER   L=$layers ud=$upperDeg ub=$ub beam=$beam rounds=$rounds recall=$r%.3f visited=$vis%.1f")
      }
    }

    // generated corpus: where the hierarchy should dominate the fixed
    // 16-row flat entry
    for (n <- Seq(4000)) {
      val corpus = graft.datagen.DataGen
        .randomFloat(spark, n, 32, centers = 32, seed = 7)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val gBase = corpus.filter(Split.isTrain(col("id"))).localCheckpoint(true)
      val gQ = corpus.filter(Split.isQuery(col("id"), 50))
        .select(col("id").as("query_id"), col("vec").as("qvec"))
        .localCheckpoint(true)
      val nb = gBase.count()
      val gExact = KnnSearch.bruteForce(gBase, gQ, 10, VecMetric.Euclidean)
        .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
      val gnEx = gExact.count().toDouble
      val gFlat = KnnSearch.bruteForceBlocked(gBase,
        gBase.select(col("id").as("query_id"), col("vec").as("qvec")),
        IQ.GraphDeg, VecMetric.Euclidean,
        pairFilter = Some(col("id") =!= col("query_id")))
        .select(col("query_id").as("id"), col("neighbor_id"))
        .localCheckpoint(true)
      def evalG(topk: org.apache.spark.sql.DataFrame,
          vis: org.apache.spark.sql.DataFrame): (Double, Double) = {
        val r = topk.select("query_id", "neighbor_id")
          .intersect(gExact).count().toDouble / gnEx
        (r, vis.agg(avg("n_visited")).head().getDouble(0))
      }
      val (fr2, fv2) = { val (t, v) = GraphSearch.beamSearchWithVisited(gBase,
        gFlat, gQ, 10, IQ.Beam, IQ.BeamRounds, 16,
        VecMetric.Euclidean, IQ.EntryBeam); evalG(t, v) }
      println(f"GEN n=$n FLAT recall=$fr2%.3f visited=$fv2%.1f (${fv2 / nb * 100}%.1f%%)")
      val levels = math.max(1,
        math.round(math.log(nb / 16.0) / math.log(2)).toInt)
      for (deg <- Seq(16); ud <- Seq(6)) {
        val stack = GraphSearch.buildLayeredGraphs(gBase, levels, deg,
          ud, VecMetric.Euclidean).localCheckpoint(true)
        for (ub <- Seq(4); beam <- Seq(8); rounds <- Seq(2, 3)) {
          val (t, v) = GraphSearch.hierarchicalSearchWithVisited(gBase, stack,
            gQ, 10, beam, rounds, levels, ub)
          val (r, vis) = evalG(t, v)
          println(f"GEN n=$n HIER sym deg=$deg L=$levels ud=$ud ub=$ub beam=$beam rounds=$rounds recall=$r%.3f visited=$vis%.1f (${vis / nb * 100}%.1f%%)")
        }
      }
    }
    spark.stop()
  }
}
