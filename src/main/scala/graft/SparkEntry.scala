package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §2 for the inventory each entry
  * implements.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_knn_euclidean")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.VectorQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.IndexQueries.queries ++
      graft.queries.EmbeddingQueries.queries ++
      graft.queries.DataGenQueries.queries ++
      graft.queries.SourceQueries.queries

  /** DuckDB-equivalent SQL for every exactly-checkable query. */
  def oracleSql: Map[String, String] =
    graft.queries.VectorQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.IndexQueries.oracleSql ++
      graft.queries.EmbeddingQueries.oracleSql ++
      graft.queries.DataGenQueries.oracleSql ++
      graft.queries.SourceQueries.oracleSql
}
