package graft.operators

import graft.SparkSpec

/** Streaks.daily: hand-built day patterns — single runs, gaps, length
  * ties (earliest start wins), duplicate events per day, null hygiene. */
class StreaksSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    val df = rows.map { case (u, d) => (u, java.sql.Timestamp.valueOf(s"$d 10:00:00")) }
      .toDF("user_id", "ts")
    Streaks.daily(df, "user_id", "ts").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("active_days"),
        r.getAs[Long]("n_streaks"), r.getAs[Long]("max_streak"),
        r.getAs[String]("max_streak_start")))).toMap
  }

  test("runs, gaps and duplicate same-day events") {
    val out = run(Seq(
      (1L, "2026-01-01"), (1L, "2026-01-02"), (1L, "2026-01-02"),
      (1L, "2026-01-03"), (1L, "2026-01-07"),
      (2L, "2026-01-05")))
    assert(out(1L) == ((4L, 2L, 3L, "2026-01-01")))
    assert(out(2L) == ((1L, 1L, 1L, "2026-01-05")))
  }

  test("length tie: earliest start wins") {
    val out = run(Seq(
      (1L, "2026-02-01"), (1L, "2026-02-02"),
      (1L, "2026-02-10"), (1L, "2026-02-11")))
    assert(out(1L) == ((4L, 2L, 2L, "2026-02-01")))
  }

  test("month boundary is still consecutive") {
    val out = run(Seq((1L, "2026-01-31"), (1L, "2026-02-01")))
    assert(out(1L) == ((2L, 1L, 2L, "2026-01-31")))
  }

  test("null users are excluded") {
    import spark.implicits._
    val df = Seq((Some(1L), "2026-01-01"), (None, "2026-01-01"))
      .map { case (u, d) => (u, java.sql.Timestamp.valueOf(s"$d 10:00:00")) }
      .toDF("user_id", "ts")
    assert(Streaks.daily(df, "user_id", "ts").count() == 1L)
  }
}
