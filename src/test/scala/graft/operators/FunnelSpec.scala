package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Funnel.firstCompletion: strict ordering, the entry-anchored
  * conversion window, first-completion dup-insensitivity, and the
  * report's integer conversion math. */
class FunnelSpec extends SparkSpec {

  private def ts(min: Long): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  private def run(evs: Seq[(Long, Timestamp, String)], window: Int = 1) = {
    import spark.implicits._
    Funnel.firstCompletion(spark, evs.toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("a", "b", "c"), window)
      .collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("strict order + window: only in-order, in-window users convert") {
    val evs = Seq(
      // user 1: full funnel in order, inside the 60-min window
      (1L, ts(0), "a"), (1L, ts(10), "b"), (1L, ts(20), "c"),
      // user 2: b BEFORE a — never reaches stage 2 (strictly after)
      (2L, ts(10), "a"), (2L, ts(5), "b"),
      // user 3: c arrives outside the entry window (a@0, c@70 > 60)
      (3L, ts(0), "a"), (3L, ts(30), "b"), (3L, ts(70), "c"),
      // user 4: enters only
      (4L, ts(0), "a"),
      // user 5: never enters (no 'a') — excluded from every stage
      (5L, ts(0), "b"), (5L, ts(1), "c"))
    val out = run(evs)
    assert(out(1) == (("a", 4L, 1000000L, 1000000L)), out)
    assert(out(2) == (("b", 2L, 500000L, 500000L)), out)
    assert(out(3) == (("c", 1L, 500000L, 250000L)), out)
  }

  test("first completion: duplicate stage events don't inflate reach") {
    val evs = Seq(
      (1L, ts(0), "a"), (1L, ts(1), "a"), (1L, ts(2), "b"),
      (1L, ts(3), "b"), (1L, ts(4), "c"), (1L, ts(5), "c"))
    val out = run(evs)
    assert(out(1)._2 == 1L && out(2)._2 == 1L && out(3)._2 == 1L, out)
  }

  test("stage-2 time anchors stage 3: c between a and b doesn't count") {
    // a@0, c@5, b@10 — the only c precedes b, so stage 3 is unreached
    val evs = Seq((1L, ts(0), "a"), (1L, ts(5), "c"), (1L, ts(10), "b"))
    val out = run(evs)
    assert(out(3)._2 == 0L, out)
    assert(out(3)._3 == 0L && out(3)._4 == 0L, "0-user stage has 0 conv")
  }

  test("validation: short or duplicated stage lists are loud") {
    import spark.implicits._
    val df = Seq((1L, ts(0), "a")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.firstCompletion(spark, df, "user_id", "ts", "event_type",
        Seq("a"), 1)
    }
    intercept[IllegalArgumentException] {
      Funnel.firstCompletion(spark, df, "user_id", "ts", "event_type",
        Seq("a", "a"), 1)
    }
  }
}
