package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** latenessReport: replay collapse by batch id, per-batch micro shares,
  * and the -1 totals row (the ledger itself is 1 row per batch, so no
  * compactor exists — minimal by construction). */
class LatenessLedgerSpec extends SparkSpec {

  test("report collapses replays and totals correctly") {
    import spark.implicits._
    // batch 1's row appears twice (an at-least-once replay)
    val l = Seq(
      (0L, 100L, 500L, -1L, 0L),
      (1L, 50L, 600L, 500L, 10L),
      (1L, 50L, 600L, 500L, 10L))
      .toDF("batch_id", "n_rows", "batch_max_us", "wm_before_us",
        "late_rows")
    val out = EventStreams.latenessReport(l)
      .orderBy(col("batch_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      (-1L, 150L, 10L, 66666L), // 10/150 in micro
      (0L, 100L, 0L, 0L),
      (1L, 50L, 10L, 200000L)))
  }
}
