package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Transitions.matrix: hand-computed transition counts and row
  * probabilities, the session-gap break, same-timestamp tie order, and
  * per-user isolation. */
class TransitionsSpec extends SparkSpec {

  private def ts(minute: Int, second: Int = 0) = new Timestamp(
    Timestamp.valueOf("2024-01-01 00:00:00").getTime +
      minute * 60000L + second * 1000L)

  private def run(rows: Seq[(Long, Timestamp, Long, String)]) = {
    import spark.implicits._
    Transitions.matrix(rows.toDF("user_id", "ts", "event_id",
      "event_type"), "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("counts, row totals, truncating probabilities") {
    // user 1: a->b->a->c (all within gap): a->b, b->a, a->c
    val out = run(Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"),
      (1L, ts(2), 3L, "a"), (1L, ts(3), 4L, "c")))
    assert(out(("a", "b")) == ((1L, 2L, 500000L)), out)
    assert(out(("a", "c")) == ((1L, 2L, 500000L)), out)
    assert(out(("b", "a")) == ((1L, 1L, 1000000L)), out)
    assert(out.size == 3, out)
  }

  test("gap over maxGapMinutes breaks the chain") {
    val out = run(Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(31), 2L, "b"),     // 31 min: broken
      (1L, ts(121), 3L, "a"), (1L, ts(151), 4L, "b"))) // exactly 30: kept
    assert(out == Map(("a", "b") -> ((1L, 1L, 1000000L))), out)
  }

  test("same-timestamp events order by the tie column") {
    val out = run(Seq(
      (1L, ts(0), 2L, "b"), (1L, ts(0), 1L, "a"), (1L, ts(1), 3L, "c")))
    assert(out.keySet == Set(("a", "b"), ("b", "c")), out)
  }

  test("transitions never cross users") {
    val out = run(Seq((1L, ts(0), 1L, "a"), (2L, ts(1), 2L, "b")))
    assert(out.isEmpty, out)
  }
}
