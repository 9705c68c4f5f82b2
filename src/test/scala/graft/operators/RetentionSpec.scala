package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Retention.weeklyCohorts: cohort assignment by first event,
  * Monday-start weeks, offset math, and dup-insensitive activity. */
class RetentionSpec extends SparkSpec {

  // 2024-01-01 is a Monday: week boundaries are 01-01, 01-08, 01-15
  private def ts(day: Int, hour: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private def run(evs: Seq[(Long, Timestamp)]) = {
    import spark.implicits._
    Retention.weeklyCohorts(evs.toDF("user_id", "ts"), "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("retention triangle: cohorts, offsets, and micro ratios") {
    val evs = Seq(
      // cohort 01-01: users 1,2 first-seen in week 1
      (1L, ts(1)), (2L, ts(3)),
      // user 1 active again in weeks 2 and 3; user 2 only week 2
      (1L, ts(8)), (1L, ts(16)), (2L, ts(10)),
      // cohort 01-08: user 3, never returns
      (3L, ts(9)))
    val out = run(evs)
    assert(out == Map(
      ("2024-01-01", 0) -> ((2L, 1000000L)),
      ("2024-01-01", 1) -> ((2L, 1000000L)),
      ("2024-01-01", 2) -> ((1L, 500000L)),
      ("2024-01-08", 0) -> ((1L, 1000000L))), out)
  }

  test("duplicate events within a week count once") {
    val evs = Seq((1L, ts(1)), (1L, ts(2)), (1L, ts(8)), (1L, ts(9, 23)))
    val out = run(evs)
    assert(out == Map(
      ("2024-01-01", 0) -> ((1L, 1000000L)),
      ("2024-01-01", 1) -> ((1L, 1000000L))), out)
  }

  test("mid-week first event still cohorts to the Monday week start") {
    // Sunday 2024-01-07 belongs to the 01-01 week
    val out = run(Seq((1L, ts(7))))
    assert(out == Map(("2024-01-01", 0) -> ((1L, 1000000L))), out)
  }

  test("cohortsFromActivity: late-merged earlier activity MOVES the " +
      "cohort (min-week re-derivation, the x172 ledger semantics)") {
    import spark.implicits._
    def act(rows: Seq[(Long, String)]) = rows
      .map { case (u, d) => (u, java.sql.Date.valueOf(d)) }
      .toDF("u", "week")
    val recent = act(Seq((1L, "2024-01-08"), (1L, "2024-01-15")))
    val withHistory = recent.unionByName(act(Seq((1L, "2024-01-01"))))
    def tri(df: org.apache.spark.sql.DataFrame) =
      Retention.cohortsFromActivity(df).collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(tri(recent) == Map(("2024-01-08", 0) -> 1L,
      ("2024-01-08", 1) -> 1L), tri(recent))
    // the older week arriving later re-anchors the whole cohort
    assert(tri(withHistory) == Map(("2024-01-01", 0) -> 1L,
      ("2024-01-01", 1) -> 1L, ("2024-01-01", 2) -> 1L),
      tri(withHistory))
  }
}
