package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EventTime.normalizeTs must map every physical vintage the generator
  * has shipped — int64 nanos (nanosAsLong), TIMESTAMP_NTZ micros,
  * session-TZ TIMESTAMP — to the IDENTICAL TimestampType micros, so a
  * testdata regeneration can never silently shift event times again. */
class EventTimeSpec extends SparkSpec {

  test("all three ts vintages normalize to identical micros") {
    import spark.implicits._
    // canonical event times, microsecond precision (UTC session)
    val micros = Seq(1700000000000001L, 1700000123456789L, 0L,
      1234567890123456L)
    val dir = java.nio.file.Files.createTempDirectory("evt_vintage")

    // vintage 1: int64 nanos column named ts (the nanosAsLong shape)
    val nanosDf = micros.map(m => (1L, m * 1000L)).toDF("event_id", "ts")
    nanosDf.write.mode("overwrite").parquet(s"$dir/nanos")

    // vintage 2: TIMESTAMP_NTZ micros
    val ntzDf = micros.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    ntzDf.write.mode("overwrite").parquet(s"$dir/ntz")

    // vintage 3: session-TZ TIMESTAMP
    val tzDf = micros.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    tzDf.write.mode("overwrite").parquet(s"$dir/tz")

    def normalizedMicros(path: String): Seq[Long] = {
      val df = EventTime.normalizeTs(spark.read.parquet(path))
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"$path not TimestampType")
      df.select(unix_micros(col("ts"))).collect().map(_.getLong(0))
        .toSeq.sorted
    }
    val want = micros.sorted
    assert(normalizedMicros(s"$dir/nanos") == want, "nanos vintage shifted")
    assert(normalizedMicros(s"$dir/ntz") == want, "NTZ vintage shifted")
    assert(normalizedMicros(s"$dir/tz") == want, "TZ vintage shifted")
  }
}
