package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** SessionAssembly.transcripts: gap splitting, total-order rendering,
  * budget truncation, the loud hot-session guard. */
class SessionAssemblySpec extends SparkSpec {

  private def ts(min: Long, us: Long = 0): Timestamp =
    new Timestamp(min * 60000L + us / 1000)

  private def run(rows: Seq[(Long, Timestamp, Long, String)],
      maxEvents: Int = 10, maxCollect: Long = 1L << 20) = {
    import spark.implicits._
    SessionAssembly.transcripts(
      rows.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type",
      gapMinutes = 30, maxEvents = maxEvents, maxCollect = maxCollect)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getString(6))))
      .toMap
  }

  test("gap splits sessions; order is (ts, id); > gap rule at boundary") {
    val out = run(Seq(
      (1L, ts(0), 3L, "a"), (1L, ts(0), 1L, "b"),  // same ts: id order
      (1L, ts(30), 2L, "c"),                        // exactly 30min: SAME
      (1L, ts(61), 4L, "d"),                        // 31min after: NEW
      (2L, ts(0), 5L, "e")))
    assert(out == Map(
      (1L, 1L) -> ((3L, false, "b;a;c")),
      (1L, 2L) -> ((1L, false, "d")),
      (2L, 1L) -> ((1L, false, "e"))), out)
  }

  test("maxEvents truncates the transcript and flags it") {
    val out = run(Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"), (1L, ts(2), 3L, "c")),
      maxEvents = 2)
    assert(out == Map((1L, 1L) -> ((3L, true, "a;b"))), out)
  }

  test("hot-session guard is loud before any collect") {
    val rows = (1L to 20L).map(i => (1L, ts(i), i, "e"))
    val e = intercept[IllegalArgumentException] {
      run(rows, maxEvents = 2, maxCollect = 10)
    }
    assert(e.getMessage.contains("hottest session"), e.getMessage)
  }

  test("parameter validation is loud") {
    intercept[IllegalArgumentException] {
      run(Seq((1L, ts(0), 1L, "a")), maxEvents = 0)
    }
    intercept[IllegalArgumentException] {
      run(Seq((1L, ts(0), 1L, "a")), maxEvents = 5, maxCollect = 4)
    }
  }
}
