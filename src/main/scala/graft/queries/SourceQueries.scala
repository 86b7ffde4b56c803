package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{EventTime, Tables}
import graft.sources.TextSources

/** Source-format ingest gates (SURVEY.md §2 s01/s02): the driver's
  * tables staged once into JSONL / CSV, then read back through the
  * schema-explicit readers and queried — the oracle compares against
  * the ORIGINAL parquet, so a gate pass proves byte-faithful ingest
  * (content hashes for text, exact aggregates for doubles), not just
  * row counts.
  */
object SourceQueries {

  private val staged = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), String]

  private def stage(s: SparkSession, dir: String, kind: String)(
      write: String => Unit): String =
    staged.getOrElseUpdate((s, dir, kind), {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft_src_$kind").toString
      write(p)
      p
    })

  /** s01: JSONL corpus ingest — documents staged as JSON-lines, read
    * back with the declared schema; md5(text) in the gate proves the
    * text column survived encoding byte-for-byte.
    */
  def s01(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val path = stage(s, dir, "jsonl")(p => TextSources.writeJsonl(docs, p))
    TextSources.readJsonl(s, path, docs.schema)
      .select(col("doc_id"), md5(col("text")).as("text_hash"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** s02: CSV log ingest — events staged as headered CSV (ts staged
    * as integer epoch-microseconds: the CSV timestamp format truncates
    * to millis, an integer column round-trips exactly; doubles
    * round-trip via shortest-repr), read back and rolled up hourly.
    * The oracle is q31's: the CSV path must feed the same pipeline to
    * the same answer.
    */
  def s02(s: SparkSession, dir: String): DataFrame = {
    val evRaw = Tables.events(s, dir)
    val ev = evRaw.select(col("event_id"), EventTime.tsUs(evRaw).as("ts_us"),
      col("user_id"), col("event_type"), col("value"))
    val path = stage(s, dir, "csv")(p => TextSources.writeCsv(ev, p))
    TextSources.readCsv(s, path, ev.schema)
      .groupBy(
        unix_timestamp(date_trunc("hour",
          timestamp_micros(col("ts_us")))).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy("hour_start", "event_type")
  }

  /** s03: ORC round-trip — lineitem staged as ORC (the second
    * columnar format a lakehouse speaks; native Spark datasource,
    * same pruning/pushdown machinery as parquet), read back and
    * rolled up in integer cents. The oracle aggregates the ORIGINAL
    * parquet, so a pass proves the numeric columns survived the
    * format conversion exactly.
    */
  def s03(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val path = stage(s, dir, "orc")(p => li.write.orc(p + "/li"))
    s.read.orc(path + "/li")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("price_cents"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** s04: raw image FILES through the binaryFile source — the
    * from-real-files loop: a directory of genuine PNG files (staged
    * once), a glob-pruned distributed listing, doc keys parsed from
    * paths, and the REAL codec decode over the content column. The
    * oracle recomputes the decoded statistics from the closed-form
    * pixel formula, so a pass proves file bytes → binary column →
    * decode end-to-end.
    */
  def s04(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val path = stage(s, dir, "imgdir")(p =>
      graft.sources.BinarySources.writeImageFiles(docs, p))
    graft.operators.Multimodal.decodeImageStats(
      graft.sources.BinarySources.readImageDir(s, path))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_jsonl_ingest" -> (s01 _),
    "s02_csv_ingest" -> (s02 _),
    "s03_orc_ingest" -> (s03 _),
    "s04_binaryfile_ingest" -> (s04 _)
  )

  val oracleSql: Map[String, String] = Map(
    "s01_jsonl_ingest" ->
      """SELECT doc_id, md5(text) AS text_hash, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "s02_csv_ingest" -> AnalyticsQueries.oracleSql("q31_stream_ingest"),
    "s03_orc_ingest" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |         AS qty_cents,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS price_cents
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // s04: m01's image-stat recomputation — decoded width/height and
    // per-channel sums from the closed-form pixel formula
    "s04_binaryfile_ingest" -> {
      val m = graft.operators.Multimodal
      val nPix = m.ImgW * m.ImgH
      def chanSum(c: Int) =
        s"""CAST(list_sum(list_transform(range(0, $nPix),
           |         i -> (doc_id * 31 + i * 7 + $c * 97) % 256)) AS BIGINT)""".stripMargin
      s"""SELECT doc_id, CAST(${m.ImgW} AS BIGINT) AS width,
         |       CAST(${m.ImgH} AS BIGINT) AS height,
         |       ${chanSum(0)} AS r_sum,
         |       ${chanSum(1)} AS g_sum,
         |       ${chanSum(2)} AS b_sum
         |FROM documents ORDER BY doc_id""".stripMargin
    }
  )
}
