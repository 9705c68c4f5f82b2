package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics on a hand-built fixture: inclusive boundaries,
  * per-key isolation, null when nothing precedes/follows. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = {
    import spark.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:00"), 10.0),
      ("A", ts("2024-01-01 10:00:05"), 11.0),
      ("B", ts("2024-01-01 10:00:03"), 99.0)
    ).toDF("sym", "qts", "px")
  }
  private lazy val trades = {
    import spark.implicits._
    Seq(
      ("A", ts("2024-01-01 10:00:04"), 1L), // after 10:00:00 quote
      ("A", ts("2024-01-01 10:00:05"), 2L), // exactly at quote — inclusive
      ("B", ts("2024-01-01 10:00:01"), 3L), // before B's only quote
      ("C", ts("2024-01-01 10:00:09"), 4L)  // key with no quotes at all
    ).toDF("sym", "tts", "trade_id")
  }

  test("backward: latest quote at-or-before each trade, per key") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"),
      leftTs = "tts", rightTs = "qts", rightPayload = Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "asof_px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq(1L -> 10.0, 2L -> 11.0, 3L -> null, 4L -> null))
  }

  test("forward: earliest quote at-or-after each trade, per key") {
    val got = AsOfJoin.forward(trades, quotes, Seq("sym"),
      leftTs = "tts", rightTs = "qts", rightPayload = Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "asof_px")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq(1L -> 11.0, 2L -> 11.0, 3L -> 99.0, 4L -> null))
  }

  test("output row count always equals the left side") {
    val n = AsOfJoin.backward(trades, quotes, Seq("sym"),
      "tts", "qts", Seq("px")).count()
    assert(n == trades.count())
  }
}
