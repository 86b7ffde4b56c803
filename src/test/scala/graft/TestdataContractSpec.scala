package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The testdata contract: the column types (and for event time, the
  * value RANGE) this engine assumes of the driver-generated tables.
  * The driver regenerates the parquet between rounds and has already
  * drifted once (events.ts: timestamp[ns] → timestamp[us]), which
  * broke 11 operators at analysis time for two rounds before anyone
  * noticed — this spec exists to fail loudly the day it drifts again.
  */
class TestdataContractSpec extends AnyFunSuite {
  import TestSpark._

  private def fieldType(table: String, column: String): DataType =
    Tables.table(spark, sf, table).schema(column).dataType

  private def assertTypes(table: String, want: (String, DataType)*): Unit = {
    val schema = Tables.table(spark, sf, table).schema
    want.foreach { case (name, t) =>
      assert(schema.fieldNames.contains(name), s"$table.$name missing")
      assert(schema(name).dataType == t,
        s"$table.$name is ${schema(name).dataType}, engine assumes $t")
    }
  }

  test("events: types the engine assumes") {
    assertTypes("events",
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)
    // ts may legitimately be any EventTime-supported physical type
    val tsType = fieldType("events", "ts")
    assert(Seq(LongType, TimestampNTZType, TimestampType).contains(tsType),
      s"events.ts is $tsType — EventTime has no reading for it")
  }

  test("events.ts: EventTime resolves and yields plausible epoch-µs") {
    val ev = Tables.events(spark, sf)
    val r = ev.agg(min(EventTime.tsUs(ev)), max(EventTime.tsUs(ev))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    // 2000-01-01 .. 2090-01-01 in epoch MICROseconds: a ns-as-µs (or
    // ms-as-µs) unit drift lands ~1000× outside this window
    assert(lo > 946684800000000L, s"min ts_us $lo below year-2000 bound")
    assert(hi < 3786912000000000L, s"max ts_us $hi above year-2090 bound")
    assert(lo <= hi)
  }

  test("embeddings / documents: types the engine assumes") {
    assertTypes("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
    assertTypes("documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }

  test("star schema: key and measure types the engine assumes") {
    assertTypes("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType)
    assertTypes("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType)
    // date-ish columns only need to stay in the family Spark coerces
    // against timestamp/date literals (a01's shipdate predicate)
    Seq("lineitem" -> "l_shipdate", "orders" -> "o_orderdate").foreach {
      case (t, c) =>
        val dt = fieldType(t, c)
        assert(Seq(TimestampNTZType, TimestampType, DateType).contains(dt),
          s"$t.$c is $dt — outside the timestamp/date family")
    }
    assertTypes("customer",
      "c_custkey" -> LongType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertTypes("supplier",
      "s_suppkey" -> LongType, "s_nationkey" -> IntegerType)
    assertTypes("nation",
      "n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType)
    assertTypes("region", "r_regionkey" -> IntegerType)
    assertTypes("part",
      "p_partkey" -> LongType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
  }
}
