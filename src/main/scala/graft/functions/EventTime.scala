package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** The events table's `ts` column has shipped in three physical shapes
  * across generator versions: TIMESTAMP(NANOS) (Spark 4 reads it only as
  * int64 nanos under `spark.sql.legacy.parquet.nanosAsLong`), plain
  * TIMESTAMP_NTZ micros, and session-TZ TIMESTAMP. Every reader funnels
  * through this normalizer so queries always see the SAME logical column:
  * session-TZ TimestampType at microsecond precision (sessions run UTC,
  * so the NTZ→TZ cast is the identity on the stored micros — the exact
  * values the int64-nanos `ts DIV 1000` path has always produced).
  */
object EventTime {

  /** Normalize `ts` to TimestampType micros, whatever the file wrote.
    * Works on both batch and streaming DataFrames (pure projection). */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      // int64 nanos via nanosAsLong: integer division, NOT col/1000 —
      // `/` promotes to double (53-bit mantissa), losing low bits of
      // ~1.7e18 values and shifting some timestamps by 1µs
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other")
    }
}
