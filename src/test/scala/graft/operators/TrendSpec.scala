package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Trend.dailyVolumeSlope: hand-computed exact OLS on a perfect ramp,
  * flat-line zero, single-day null, truncating relative slope, and
  * group isolation. */
class TrendSpec extends SparkSpec {

  /** n events on day d (2024-01-01 = day 0). */
  private def dayRows(grp: String, d: Int, n: Int) = (0 until n).map { i =>
    (grp, new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
      d * 86400000L + i * 1000L))
  }

  private def run(rows: Seq[(String, Timestamp)]) = {
    import spark.implicits._
    Trend.dailyVolumeSlope(rows.toDF("grp", "ts"), "ts", "grp")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) null else Long.box(r.getLong(4)),
        if (r.isNullAt(5)) null else Long.box(r.getLong(5)))))
      .toMap
  }

  test("perfect ramp fits exactly; flat line reads zero") {
    // ramp 10,20,30 over days 0..2: slope exactly 10/day, mean 20
    // flat 7,7,7: slope 0
    val out = run(dayRows("up", 0, 10) ++ dayRows("up", 1, 20) ++
      dayRows("up", 2, 30) ++ dayRows("fl", 0, 7) ++
      dayRows("fl", 1, 7) ++ dayRows("fl", 2, 7))
    assert(out("up") ==
      ((3L, 60L, 20L, 10000000L, 500000L)), out)   // 10e6; 10/20 = 0.5
    assert(out("fl") == ((3L, 21L, 7L, 0L, 0L)), out)
  }

  test("a single-day group reports null slope, never a crash") {
    val out = run(dayRows("one", 5, 4))
    assert(out("one") == ((1L, 4L, 4L, null, null)), out)
  }

  test("decay is negative and truncates toward zero") {
    // 9,6,3 over days 0..2: slope exactly -3/day, mean 6, rel -0.5
    val out = run(dayRows("dn", 0, 9) ++ dayRows("dn", 1, 6) ++
      dayRows("dn", 2, 3))
    assert(out("dn") ==
      ((3L, 18L, 6L, -3000000L, -500000L)), out)
  }
}
