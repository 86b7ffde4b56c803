package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.{Column, SparkSession}

/** Bridge into `private[sql]` Spark internals (Spark 4 made
  * `Column(expr)` implementation-agnostic; the classic converter is
  * package-private). Lives under org.apache.spark.sql so the rest of
  * the library can build Columns from custom Catalyst Expressions.
  */
object Shim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Register a raw Expression builder as a SQL function. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
