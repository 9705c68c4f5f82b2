package graft.operators

import graft.SparkSpec

/** Ledger.clampedBalanceSummary: the recurrence replayed by hand —
  * clamps forget history, shortfalls accumulate, never-clamped walks
  * reduce to plain prefix sums, accounts are independent. */
class LedgerSpec extends SparkSpec {

  private def run(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    Ledger.clampedBalanceSummary(rows.toDF("acct", "seq", "delta"),
      "acct", "delta", Seq("seq"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("clamp forgets history; shortfall is the unmet draw") {
    // +5, -10 (clamp: short 5, bal 0), +3, -1 -> final 2, peak 5
    val out = run(Seq(("a", 1L, 5L), ("a", 2L, -10L), ("a", 3L, 3L),
      ("a", 4L, -1L)))
    assert(out("a") == ((4L, 2L, 5L, 1L, 5L)), out)
  }

  test("double clamp: each deeper draw counts and accumulates") {
    // -4 (short 4), +2, -3 (short 1), +7 -> final 7, peak 7, clamps 2
    val out = run(Seq(("b", 1L, -4L), ("b", 2L, 2L), ("b", 3L, -3L),
      ("b", 4L, 7L)))
    assert(out("b") == ((4L, 7L, 7L, 2L, 5L)), out)
  }

  test("never-clamped walk is a plain prefix sum; accounts isolate") {
    val out = run(Seq(("c", 1L, 3L), ("c", 2L, -1L), ("c", 3L, 4L),
      ("d", 1L, -100L)))
    assert(out("c") == ((3L, 6L, 6L, 0L, 0L)), out)
    assert(out("d") == ((1L, 0L, 0L, 1L, 100L)), out)
  }

  test("missing order columns are loud") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L)).toDF("acct", "seq", "delta")
    intercept[IllegalArgumentException] {
      Ledger.clampedBalanceSummary(df, "acct", "delta", Seq.empty)
    }
  }
}
