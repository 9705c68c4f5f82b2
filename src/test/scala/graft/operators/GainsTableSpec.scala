package graft.operators

import graft.SparkSpec

/** GainsTable.byRank: hand-computed deciles on a perfectly-ranked
  * outcome (max lift at the top, exactly 10⁶ cumulative at the bottom),
  * a random-scorer null (lift ≈ 1 everywhere), uneven bucket math, and
  * the loud null/zero-positive guards. */
class GainsTableSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, Boolean)], parts: Int) = {
    import spark.implicits._
    GainsTable.byRank(rows.toDF("id", "k", "y"), "id", "k", "y",
        parts = parts, bucketChars = 2)
      .collect()
      .map(r => r.getAs[Long]("bucket") -> ((r.getAs[Long]("n"),
        r.getAs[Long]("positives"), r.getAs[Long]("cum_lift_micro"))))
      .toMap
  }

  test("perfect ranking: top bucket captures all positives") {
    // 20 rows, 5 positives ranked first (keys 00..04)
    val rows = (0 until 20).map(i => (i.toLong, f"$i%02d", i < 5))
    val out = run(rows, 4)
    assert(out(1L) == ((5L, 5L, 4000000L))) // 5/5 vs base 5/20: lift 4
    assert(out(2L)._2 == 0L)
    assert(out(4L)._3 == 1000000L) // full-corpus cumulative = base rate
  }

  test("constant outcome: lift pins to 10^6 in every bucket") {
    val rows = (0 until 12).map(i => (i.toLong, f"$i%02d", true))
    val out = run(rows, 3)
    for (b <- 1L to 3L) assert(out(b)._3 == 1000000L, s"bucket $b")
  }

  test("uneven split: (pos-1)*parts DIV n buckets stay within one row") {
    val rows = (0 until 11).map(i => (i.toLong, f"$i%02d", i % 2 == 0))
    val out = run(rows, 3)
    assert(out.values.map(_._1).sum == 11L)
    assert(out.values.map(_._1).max - out.values.map(_._1).min <= 1L)
  }

  test("loud guards: null outcome, zero positives") {
    import spark.implicits._
    val nulls = Seq((1L, "00", Some(true)), (2L, "01", Option.empty[Boolean]))
      .toDF("id", "k", "y")
    val e = intercept[Exception] {
      GainsTable.byRank(nulls, "id", "k", "y", 2, 2).collect()
    }
    assert(e.getMessage.contains("null y"), e.getMessage)
    val zp = Seq((1L, "00", false), (2L, "01", false)).toDF("id", "k", "y")
    val z = intercept[Exception] {
      GainsTable.byRank(zp, "id", "k", "y", 2, 2).collect()
    }
    assert(z.getMessage.contains("zero positives"), z.getMessage)
  }
}
