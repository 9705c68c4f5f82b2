package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** mergeSessionLedger's cross-batch stitching: the adversarial
  * interleaved split (outer events in one batch, the bridging event in
  * another), true session breaks never bridged, overlap/backfill
  * merging, and count preservation. Summaries are hand-built exactly as
  * the writer's per-batch sessionization would emit them. */
class SessionLedgerSpec extends SparkSpec {

  private def merge(rows: Seq[(Long, Long, Long, Long, Long)],
      gapMin: Int) = {
    import spark.implicits._
    EventStreams.mergeSessionLedger(
        rows.toDF("u", "start_us", "end_us", "n", "batch_id"), gapMin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private val M = 60000000L // one minute in micros

  test("interleaved split: the bridging event stitches outer sessions") {
    // events at 0, 100s, 200s with gap 3min: one true session.
    // batch 0 holds {0} and {200s} (200s apart > 180s -> two summaries);
    // batch 1 holds the bridge {100s}
    val led = Seq(
      (1L, 0L, 0L, 1L, 0L), (1L, 200 * 1000000L, 200 * 1000000L, 1L, 0L),
      (1L, 100 * 1000000L, 100 * 1000000L, 1L, 1L))
    assert(merge(led, 3) == Set((1L, 0L, 200 * 1000000L, 3L)))
  }

  test("a true break is never bridged, whatever the split") {
    // sessions [0..100s] and [10000s..]: the closest spanning pair is
    // 100s -> 10000s, far beyond any summary's reach
    val led = Seq(
      (1L, 0L, 0L, 1L, 0L), (1L, 10000 * 1000000L, 10000 * 1000000L, 1L, 0L),
      (1L, 100 * 1000000L, 100 * 1000000L, 1L, 1L))
    assert(merge(led, 3) == Set((1L, 0L, 100 * 1000000L, 2L),
      (1L, 10000 * 1000000L, 10000 * 1000000L, 1L)))
  }

  test("overlapping backfill summaries merge with counts summed") {
    val led = Seq(
      (1L, 0L, 10 * M, 5L, 0L), (1L, 2 * M, 12 * M, 4L, 1L),
      (2L, 0L, M, 2L, 0L))
    assert(merge(led, 1) == Set((1L, 0L, 12 * M, 9L), (2L, 0L, M, 2L)))
  }

  test("compaction pre-merges history, keeps the last batch verbatim") {
    import spark.implicits._
    val led = Seq(
      (1L, 0L, 10 * M, 2L, 0L), (1L, 100 * M, 110 * M, 3L, 0L),
      (1L, 11 * M, 20 * M, 2L, 1L),
      (1L, 200 * M, 210 * M, 1L, 2L))
      .toDF("u", "start_us", "end_us", "n", "batch_id")
    val compacted = EventStreams.compactSessionLedger(led, 1)
    assert(compacted.count() == 3) // 2 merged history rows + last batch
    assert(compacted.filter(col("batch_id") === 2L).count() == 1)
    // lossless under the merge view
    val before = EventStreams.mergeSessionLedger(led, 1).collect().toSet
    val after = EventStreams.mergeSessionLedger(compacted, 1)
      .collect().toSet
    assert(before.map(_.toSeq) == after.map(_.toSeq))
  }
}
