package graft.streaming

import graft.SparkSpec
import graft.operators.Burstiness
import org.apache.spark.sql.functions._

/** mergeBurstinessLedger: boundary-gap stitching equals the batch x185
  * on a time-ordered split; the interleave guard fires on backfills;
  * compaction is lossless and strictly shrinks. Partials are hand-built
  * exactly as the writer's per-batch aggregation emits them. */
class BurstinessLedgerSpec extends SparkSpec {

  private def events(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, sec), i) =>
      (u, new java.sql.Timestamp(sec * 1000L), i.toLong) }
      .toDF("user_id", "ts", "event_id")
  }

  /** the writer's per-batch partial, computed by hand */
  private def partial(u: Long, secs: Seq[Long], batch: Long) = {
    val gaps = secs.sorted.sliding(2).filter(_.size == 2)
      .map(p => p(1) - p(0)).toSeq
    (u, secs.size.toLong, secs.min * 1000000L, secs.max * 1000000L,
      gaps.sum, BigDecimal(gaps.map(g => g * g).sum), batch)
  }

  test("stitched merge equals the whole-corpus x185") {
    import spark.implicits._
    // user 1: events at 0,10,30 | 100,160  (time-ordered split)
    val led = Seq(partial(1L, Seq(0L, 10L, 30L), 0L),
      partial(1L, Seq(100L, 160L), 1L))
      .toDF("u", "n", "first_us", "last_us", "s1", "s2", "batch_id")
    val got = EventStreams.mergeBurstinessLedger(led, "user_id", 2L)
      .collect().head
    val want = Burstiness.interArrival(
      events(Seq((1L, 0L), (1L, 10L), (1L, 30L), (1L, 100L), (1L, 160L))),
      "user_id", "ts", "event_id", 2L).collect().head
    assert(got.toSeq == want.toSeq, s"${got.toSeq} vs ${want.toSeq}")
  }

  test("interleaving batch intervals fail loudly") {
    import spark.implicits._
    val led = Seq(partial(1L, Seq(0L, 100L), 0L),
      partial(1L, Seq(50L, 60L), 1L))
      .toDF("u", "n", "first_us", "last_us", "s1", "s2", "batch_id")
    val e = intercept[Exception] {
      EventStreams.mergeBurstinessLedger(led, "user_id", 1L).collect()
    }
    assert(e.getMessage.contains("interleave"), e.getMessage)
  }

  test("non-overlapping backfill (between two intervals) merges correctly") {
    import spark.implicits._
    // batch 2 is a BACKFILL landing strictly between batch 0 and 1 —
    // out of batch order, but intervals don't overlap: the merge
    // orders by first_us, so no flag and the report equals batch x185
    val led = Seq(partial(1L, Seq(0L, 10L), 0L),
      partial(1L, Seq(100L, 160L), 1L),
      partial(1L, Seq(30L, 50L), 2L))
      .toDF("u", "n", "first_us", "last_us", "s1", "s2", "batch_id")
    val got = EventStreams.mergeBurstinessLedger(led, "user_id", 2L)
      .collect().head
    val want = Burstiness.interArrival(
      events(Seq((1L, 0L), (1L, 10L), (1L, 30L), (1L, 50L),
        (1L, 100L), (1L, 160L))),
      "user_id", "ts", "event_id", 2L).collect().head
    assert(got.toSeq == want.toSeq, s"${got.toSeq} vs ${want.toSeq}")
  }

  test("repair: overlapping backfill replayed from events equals batch x185") {
    import spark.implicits._
    // user 1: batch 0 saw 0,100; the backfill batch 1 delivers 50,60 —
    // INSIDE batch 0's interval: batch 0's 0→100 gap should have been
    // split, so partials are unstitchable and the merge raises
    val led = Seq(partial(1L, Seq(0L, 100L), 0L),
      partial(1L, Seq(50L, 60L), 1L),
      // user 2 is untouched and must pass through byte-identical
      partial(2L, Seq(0L, 10L), 0L), partial(2L, Seq(30L, 70L), 1L))
      .toDF("u", "n", "first_us", "last_us", "s1", "s2", "batch_id")
    val ev = events(Seq((1L, 0L), (1L, 100L), (1L, 50L), (1L, 60L),
      (2L, 0L), (2L, 10L), (2L, 30L), (2L, 70L)))
    intercept[Exception] {
      EventStreams.mergeBurstinessLedger(led, "user_id", 1L).collect()
    }
    val repaired = EventStreams.repairBurstinessLedger(
      led, ev, "user_id", "ts", "event_id")
    // only user 1 was replayed: one -1 partial; user 2 rows intact
    assert(repaired.filter(col("u") === 1L).count() == 1)
    assert(repaired.filter(col("u") === 1L).select("batch_id")
      .head().getLong(0) == -1L)
    assert(repaired.filter(col("u") === 2L).count() == 2)
    val got = EventStreams.mergeBurstinessLedger(repaired, "user_id", 1L)
      .collect().map(_.toSeq).toSet
    val want = Burstiness.interArrival(ev, "user_id", "ts", "event_id", 1L)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"$got vs $want")
    // idempotent: repairing a repaired ledger changes nothing
    val again = EventStreams.repairBurstinessLedger(
      repaired, ev, "user_id", "ts", "event_id")
    assert(again.collect().map(_.toSeq).toSet ==
      repaired.collect().map(_.toSeq).toSet)
  }

  test("compaction: lossless under the merge, strictly shrinks") {
    import spark.implicits._
    val led = Seq(partial(1L, Seq(0L, 10L), 0L),
      partial(1L, Seq(20L, 40L), 1L), partial(1L, Seq(100L), 2L))
      .toDF("u", "n", "first_us", "last_us", "s1", "s2", "batch_id")
    val compacted = EventStreams.compactBurstinessLedger(led)
    assert(compacted.count() == 2) // 1 merged history + last batch
    val before = EventStreams.mergeBurstinessLedger(led, "user_id", 1L)
      .collect().map(_.toSeq).toSet
    val after = EventStreams.mergeBurstinessLedger(compacted, "user_id", 1L)
      .collect().map(_.toSeq).toSet
    assert(before == after)
    // idempotent
    val twice = EventStreams.compactBurstinessLedger(compacted)
    assert(EventStreams.mergeBurstinessLedger(twice, "user_id", 1L)
      .collect().map(_.toSeq).toSet == before)
  }
}
