package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injection installs the kernels in a new session") {
    // `spark.sql.extensions=graft.GraftExtensions` is a STATIC conf —
    // it only takes effect when the SparkContext is created, so on the
    // shared test context we exercise the same injection through the
    // programmatic builder route. Never stop() the shared context.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val row = spark.sql(
        "SELECT vec_l2(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS d").head()
      assert(row.getDouble(0) == 5.0)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
