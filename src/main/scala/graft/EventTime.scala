package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType,
  TimestampNTZType, TimestampType}

/** Schema-adaptive accessors for the events table's `ts` column.
  *
  * The driver's testdata has shipped `ts` as BOTH parquet
  * timestamp[ns] (surfacing as Long under
  * spark.sql.legacy.parquet.nanosAsLong) and timestamp[us] (surfacing
  * as TIMESTAMP_NTZ — the legacy conf only applies to ns). Hard-coding
  * either reading breaks at ANALYSIS time the day the physical type
  * drifts, so every consumer goes through these accessors: a future
  * drift is one new match arm here, not a sweep of call sites.
  *
  * With the session timezone pinned to UTC (GraftSession), the
  * NTZ→TIMESTAMP cast is instant-preserving, so [[tsUs]] equals the
  * DuckDB oracles' epoch_us(CAST(ts AS TIMESTAMP)) exactly.
  */
object EventTime {

  /** `ts` as microseconds since the epoch (LongType). */
  def tsUs(df: DataFrame): Column = tsUs(df.schema)

  def tsUs(schema: StructType): Column = tsType(schema) match {
    case LongType         => expr("ts div 1000") // ns-as-long → µs
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case TimestampType    => unix_micros(col("ts"))
    case other            => unsupported(other)
  }

  /** `ts` as a proper TIMESTAMP column (for windows / watermarks). */
  def eventTime(df: DataFrame): Column = eventTime(df.schema)

  def eventTime(schema: StructType): Column = tsType(schema) match {
    case LongType                          => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType | TimestampType  => col("ts").cast(TimestampType)
    case other                             => unsupported(other)
  }

  private def tsType(schema: StructType): DataType = schema("ts").dataType

  private def unsupported(t: DataType): Nothing =
    throw new IllegalStateException(
      s"events.ts has unsupported type $t — add a match arm in EventTime")
}
