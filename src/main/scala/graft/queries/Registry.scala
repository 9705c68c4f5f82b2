package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (optionally) an
  * equivalent ANSI SQL text the driver runs in DuckDB as the oracle.
  *
  * Determinism contract (both engines must produce bit-identical results):
  *   - money/double aggregates go through DECIMAL(18,2) casts so sums are
  *     exact and order-independent;
  *   - every query ends in a total-order ORDER BY (ties broken by keys);
  *   - timestamps are truncated/formatted to strings (events.ts is
  *     ns-precision in parquet; Spark reads µs, DuckDB ns);
  *   - computed integer columns are cast to BIGINT on the Spark side to
  *     match DuckDB's 64-bit arithmetic defaults.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryPack {
  def all: Seq[Q]
  /** Load one of the driver test tables from the given sf directory.
    *
    * `events.parquet`'s ts physical type varies by generator version
    * (TIMESTAMP(NANOS) / TIMESTAMP_NTZ µs / TIMESTAMP); normalize through
    * [[graft.functions.EventTime.normalizeTs]] so every query sees the
    * identical session-TZ TimestampType micros the oracle sees.
    */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      graft.functions.EventTime.normalizeTs(
        s.read.parquet(s"$dir/$name.parquet"))
    } else s.read.parquet(s"$dir/$name.parquet")
}
