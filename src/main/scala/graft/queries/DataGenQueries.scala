package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.datagen.DataGen

/** Dataset-generation suite (reference datasets.py:332-453): g01
  * materialises one corpus per generator family at fixed params into
  * parquet, reads them back, and gates structural invariants — row
  * counts, exact train/test split sizes, payload widths. Every gated
  * number is derivable from the params alone (the split is
  * id-deterministic), so the DuckDB oracle is a literal table; value
  * determinism and distribution shape are asserted in DataGenSpec.
  */
object DataGenQueries {
  val N = 2000L
  val Dims = 16
  val Centers = 8
  val SetSize = 20
  val Universe = 100
  val NFilters = 3
  val FieldDim = 12
  val Seed = 42L

  /** Generate + write once per session (the corpora are param-pinned,
    * not per-dataset-dir).
    */
  private val genCache =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  private def genDir(s: SparkSession): String =
    genCache.getOrElseUpdate(s, {
      val p = Files.createTempDirectory("graft_datagen").toString
      DataGen.write(DataGen.randomFloat(s, N, Dims, Centers, Seed),
        s"$p/float")
      DataGen.write(DataGen.randomBitstring(s, N, Dims, Centers, Seed),
        s"$p/bitstring")
      DataGen.write(DataGen.randomJaccard(s, N, SetSize, Universe, Seed),
        s"$p/jaccard")
      DataGen.write(DataGen.randomFilter(s, N, Dims, Centers, NFilters, Seed),
        s"$p/filter")
      DataGen.write(DataGen.randomMv(s, N, FieldDim, Seed), s"$p/mv")
      p
    })

  def g01(s: SparkSession, dir: String): DataFrame = {
    val p = genDir(s)
    def summarize(name: String, df: DataFrame, width: Column): DataFrame =
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
        sum(when(col("is_train"), 0L).otherwise(1L)).as("n_test"),
        max(width).cast("long").as("width"))
        .withColumn("dataset", lit(name))
        .select("dataset", "n_rows", "n_train", "n_test", "width")
    val ft = graft.Tables.parquetAt(s, s"$p/filter")
    summarize("float", graft.Tables.parquetAt(s, s"$p/float"), size(col("embedding")))
      .unionAll(summarize("bitstring", graft.Tables.parquetAt(s, s"$p/bitstring"),
        size(col("bits"))))
      .unionAll(summarize("jaccard", graft.Tables.parquetAt(s, s"$p/jaccard"),
        size(col("elems"))))
      .unionAll(summarize("filter", ft,
        lit(ft.columns.count(_.startsWith("label_")))))
      .unionAll(summarize("mv", graft.Tables.parquetAt(s, s"$p/mv"),
        size(col("field_0")) + size(col("field_1")) +
          size(col("field_2")) + size(col("field_3"))))
      .orderBy("dataset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_datagen" -> (g01 _)
  )

  val oracleSql: Map[String, String] = Map(
    "g01_datagen" -> {
      val nTest = (N + 9) / 10
      val nTrain = N - nTest
      val words = (Dims + 63) / 64
      s"""SELECT dataset, CAST(n_rows AS BIGINT) AS n_rows,
         |       CAST(n_train AS BIGINT) AS n_train,
         |       CAST(n_test AS BIGINT) AS n_test,
         |       CAST(width AS BIGINT) AS width
         |FROM (VALUES
         |  ('bitstring', $N, $nTrain, $nTest, $words),
         |  ('filter', $N, $nTrain, $nTest, $NFilters),
         |  ('float', $N, $nTrain, $nTest, $Dims),
         |  ('jaccard', $N, $nTrain, $nTest, $SetSize),
         |  ('mv', $N, $nTrain, $nTest, ${4 * FieldDim}))
         |  t(dataset, n_rows, n_train, n_test, width)
         |ORDER BY dataset""".stripMargin
    }
  )
}
