package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Retention.rollingActive: hand-computed exact rolling distincts, the
  * within-day and within-window dedup, observed-days-only reporting,
  * and validation. */
class RollingActiveSpec extends SparkSpec {

  private def day(d: Int, h: Int = 9) =
    Timestamp.valueOf(f"2024-01-${d + 1}%02d $h%02d:00:00")

  private def run(rows: Seq[(Long, Timestamp)], windows: Seq[Int]) = {
    import spark.implicits._
    Retention.rollingActive(rows.toDF("user_id", "ts"),
      "user_id", "ts", windows)
      .collect()
      .map(r => r.getString(0) ->
        windows.indices.map(i => r.getLong(i + 1)))
      .toMap
  }

  test("exact rolling distinct counts; same-user dups count once") {
    // day0: u1 (twice), u2; day1: u1; day3: u3
    val out = run(Seq((1L, day(0, 8)), (1L, day(0, 20)), (2L, day(0)),
      (1L, day(1)), (3L, day(3))), Seq(1, 3))
    assert(out("2024-01-01") == Seq(2L, 2L), out)
    // day1: DAU {u1}; trailing-3 {u1, u2}
    assert(out("2024-01-02") == Seq(1L, 2L), out)
    // day3: DAU {u3}; trailing-3 covers days 1..3 -> {u1, u3}
    assert(out("2024-01-04") == Seq(1L, 2L), out)
    // day2 unobserved: not reported
    assert(out.size == 3, out)
  }

  test("a user active on several days counts once per window") {
    val out = run(Seq((1L, day(0)), (1L, day(1)), (1L, day(2))), Seq(7))
    assert(out.values.forall(_ == Seq(1L)), out)
  }

  test("bad windows are loud") {
    import spark.implicits._
    val df = Seq((1L, day(0))).toDF("user_id", "ts")
    intercept[IllegalArgumentException] {
      Retention.rollingActive(df, "user_id", "ts", Seq(7, 7))
    }
    intercept[IllegalArgumentException] {
      Retention.rollingActive(df, "user_id", "ts", Seq.empty)
    }
  }
}
