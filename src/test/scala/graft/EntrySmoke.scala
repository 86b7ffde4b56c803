package graft
import org.scalatest.funsuite.AnyFunSuite
class EntrySmoke extends AnyFunSuite {
  test("driver entry() smoke: rows > 0 on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
