package graft.operators

import graft.SparkSpec

/** RobustStats.madOutliers: hand-computed lower medians and MADs, the
  * outlier-immunity property that defines the method, the MAD-zero
  * strictness, even-n lower-median choice, and group isolation. */
class RobustStatsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, Long)], k: Int = 3) = {
    import spark.implicits._
    RobustStats.madOutliers(rows.toDF("id", "grp", "v"),
      "id", "grp", "v", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))))
      .toMap
  }

  test("median/MAD flag the spike the mean-based z-score drowns in") {
    // {10,11,12,13,1000}: median 12, |dev| {2,1,0,1,988} -> MAD 1;
    // the 1000 is 988 MADs out; mean/sigma would put it ~1.7 sigma
    val out = run(Seq((1L, "a", 10L), (2L, "a", 11L), (3L, "a", 12L),
      (4L, "a", 13L), (5L, "a", 1000L)))
    assert(out(5L) == ((1000L, 12L, 1L, true)), out)
    assert(out(1L) == ((10L, 12L, 1L, false)), out)
    assert(out.count(_._2._4) == 1, out)
  }

  test("even n takes the lower middle") {
    // {1,2,3,4}: cum targets (4+1) div 2 = 2 -> median 2;
    // devs {1,0,1,2} -> MAD 1
    val out = run(Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "a", 4L)))
    assert(out(1L)._2 == 2L && out(1L)._3 == 1L, out)
  }

  test("MAD zero flags any strict deviation") {
    val out = run(Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 5L),
      (4L, "a", 6L)))
    assert(out(4L) == ((6L, 5L, 0L, true)), out)
    assert(!out(1L)._4, out)
  }

  test("groups are independent") {
    val out = run(Seq((1L, "a", 1L), (2L, "a", 1L), (3L, "a", 100L),
      (4L, "b", 100L), (5L, "b", 100L), (6L, "b", 1L)))
    assert(out(3L)._4 && out(6L)._4, out)
    assert(!out(1L)._4 && !out(4L)._4, out)
    assert(out(1L)._2 == 1L && out(4L)._2 == 100L, out)
  }
}
