package graft.operators

import graft.SparkSpec

/** Attribution.lastTouch: most-recent-touch selection, lookback expiry,
  * same-timestamp touch precedence, cross-user isolation, sentinel
  * hygiene, and the touch/conversion type contracts. */
class AttributionSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, String, Long, String)],
      lookback: Long = 3600L) = {
    import spark.implicits._
    val df = rows.map { case (u, t, id, ty) => (u, ts(t), id, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    Attribution.lastTouch(df, "user_id", "ts", "event_id", "event_type",
        "purchase", Seq("click", "view"), lookback)
      .collect()
      .map(r => r.getAs[Long]("conv_id") ->
        ((r.getAs[String]("attributed"), r.getAs[Long]("touch_id"),
          r.getAs[Long]("age_sec")))).toMap
  }

  test("most recent qualifying touch wins; older touches lose") {
    val out = run(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "view"),
      (1L, "2026-01-01 10:30:00", 2L, "click"),
      (1L, "2026-01-01 10:45:00", 3L, "purchase")))
    assert(out(3L) == (("click", 2L, 900L)))
  }

  test("touch outside the lookback window does not attribute") {
    val out = run(Seq(
      (1L, "2026-01-01 08:00:00", 1L, "click"),
      (1L, "2026-01-01 10:00:00", 2L, "purchase")), lookback = 3600L)
    assert(out(2L) == (("none", -1L, -1L)))
  }

  test("same-timestamp touch attributes (sorts before the conversion)") {
    val out = run(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "view"),
      (1L, "2026-01-01 10:00:00", 2L, "purchase")))
    assert(out(2L) == (("view", 1L, 0L)))
  }

  test("touches do not leak across users; conversions are not touches") {
    val out = run(Seq(
      (1L, "2026-01-01 10:00:00", 1L, "click"),
      (2L, "2026-01-01 10:05:00", 2L, "purchase"),
      (1L, "2026-01-01 10:10:00", 3L, "purchase"),
      (1L, "2026-01-01 10:20:00", 4L, "purchase")))
    assert(out(2L) == (("none", -1L, -1L)))
    assert(out(3L) == (("click", 1L, 600L)))
    // event 3 (a conversion) must NOT attribute event 4
    assert(out(4L) == (("click", 1L, 1200L)))
  }

  test("type contracts fail loudly") {
    import spark.implicits._
    val df = Seq((1L, ts("2026-01-01 10:00:00"), 1L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    intercept[IllegalArgumentException] {
      Attribution.lastTouch(df, "user_id", "ts", "event_id",
        "event_type", "click", Seq("click"), 60L)
    }
  }
}
