package graft.operators

import graft.SparkSpec

/** RateCeiling.slidingPeak == the brute-force max over all trailing
  * windows, including boundary inclusion/exclusion, duplicate
  * timestamps, earliest-anchor ties, and user isolation. */
class RateCeilingSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long)], w: Long) = {
    import spark.implicits._
    val df = rows.map { case (u, sec) =>
      (u, new java.sql.Timestamp(sec * 1000L)) }.toDF("user_id", "ts")
    RateCeiling.slidingPeak(df, "user_id", "ts", w).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_events"),
        r.getAs[Long]("peak"), r.getAs[String]("peak_at")))).toMap
  }

  private def brutePeak(secs: Seq[Long], w: Long): Long =
    secs.map(t => secs.count(s => s > t - w && s <= t).toLong).max

  test("window boundary: w-1 apart counts, w apart does not") {
    // 60s window: events at 0 and 59 share a window; 0 and 60 do not
    val a = run(Seq((1L, 0L), (1L, 59L)), 60L)
    assert(a(1L)._2 == 2L)
    val b = run(Seq((1L, 0L), (1L, 60L)), 60L)
    assert(b(1L)._2 == 1L)
  }

  test("matches brute force on an irregular series; earliest anchor") {
    val secs = Seq(0L, 10L, 11L, 12L, 70L, 71L, 72L, 73L, 200L)
    val out = run(secs.map((1L, _)), 60L)
    assert(out(1L)._2 == brutePeak(secs, 60L))
    assert(out(1L)._2 == 4L)
    // peak 4 first attained already at t=12 (0,10,11,12 within 60s) —
    // earlier than the 70..73 burst; earliest anchor wins
    assert(out(1L)._3 == "1970-01-01 00:00:12")
  }

  test("duplicate timestamps all count; users are isolated") {
    val out = run(Seq((1L, 5L), (1L, 5L), (1L, 5L), (2L, 5L)), 10L)
    assert(out(1L) == ((3L, 3L, "1970-01-01 00:00:05")))
    assert(out(2L) == ((1L, 1L, "1970-01-01 00:00:05")))
  }
}
