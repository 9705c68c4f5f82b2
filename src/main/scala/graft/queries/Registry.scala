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
    * `events.parquet` stores ts as TIMESTAMP(NANOS), which Spark 4 rejects
    * by default; read nanos as long and truncate to µs — the same value
    * DuckDB sees after its ns→µs truncation, so oracles stay bit-identical.
    */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/$name.parquet")
      // integer division, NOT col/1000: `/` promotes the int64 nanos to
      // double (53-bit mantissa), losing the low bits of ~1.7e18 values
      // and shifting some timestamps by 1µs.
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else s.read.parquet(s"$dir/$name.parquet")
}
