package graft.tools

import graft.GraftSession

/** Bit-identity check between two saved graph edge lists (the
  * r16 campaign's chunked-vs-broadcast gate at 10M: NnDescentSpec
  * proves the three-way identity at sf0.001; this asserts the same
  * equality on the full-scale artifacts the campaign built). Prints
  * one JSON line; rc 0 iff the edge sets are identical.
  *
  *   scripts/scalebench.sh via GRAFT_MAIN=graft.tools.GraphCompare dirA dirB
  */
object GraphCompare {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GraphCompare <parquetA> <parquetB>")
    val spark = GraftSession.create(appName = "graft-graph-compare")
    val a = spark.read.parquet(args(0))
    val b = spark.read.parquet(args(1))
    val cols = a.columns.sorted.map(org.apache.spark.sql.functions.col)
    val (ca, cb) = (a.select(cols: _*), b.select(cols: _*))
    val onlyA = ca.exceptAll(cb).count()
    val onlyB = cb.exceptAll(ca).count()
    val (na, nb) = (ca.count(), cb.count())
    println(s"""{"rows_a":$na,"rows_b":$nb,"only_a":$onlyA,"only_b":$onlyB,"identical":${onlyA == 0 && onlyB == 0 && na == nb}}""")
    spark.stop()
    if (onlyA != 0 || onlyB != 0 || na != nb) sys.exit(1)
  }
}
