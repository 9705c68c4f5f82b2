package graft.operators

import graft.SparkSpec

/** Cusum.dailyUpward == the brute-force Page recurrence, including the
  * reset-to-zero behavior and a planted sustained shift that flags
  * while staying invisible to any single day. */
class CusumSpec extends SparkSpec {

  /** events: `counts(i)` events on day i for one group. */
  private def run(counts: Seq[Int], hMult: Long = 3L) = {
    import spark.implicits._
    val rows = counts.zipWithIndex.flatMap { case (n, day) =>
      Seq.fill(n)(("g", java.sql.Timestamp.valueOf(
        f"2026-01-${day + 1}%02d 12:00:00")))
    }.toDF("grp", "ts")
    Cusum.dailyUpward(rows, "grp", "ts", hMult)
      .orderBy(org.apache.spark.sql.functions.col("day"))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("k"),
        r.getAs[Long]("cusum"), r.getAs[Boolean]("flagged")))
  }

  private def brute(counts: Seq[Int]): Seq[Long] = {
    val k = counts.map(_.toLong).sum / counts.size
    counts.map(_.toLong).scanLeft(0L) { (s, x) =>
      math.max(0L, s + (x - k))
    }.tail
  }

  test("matches the Page recurrence including resets") {
    val series = Seq(5, 3, 8, 2, 6, 1, 9, 4)
    val got = run(series).map(_._3)
    assert(got.toSeq == brute(series), s"$got vs ${brute(series)}")
  }

  test("a sustained small shift flags; no single day stands out") {
    // k = 130/20 = 6; last 10 days shift to 8 — each day drifts just
    // +2, the accumulated 20 crosses h = 3k = 18
    val series = Seq(5, 5, 4, 6, 5, 5, 4, 6, 5, 5,
      8, 8, 8, 8, 8, 8, 8, 8, 8, 8)
    val out = run(series)
    assert(out.map(_._3).toSeq == brute(series))
    assert(out.last._4, s"shift did not flag: ${out.last}")
    assert(!out(9)._4, "pre-shift day wrongly flagged")
    assert(series.max <= 8) // no spike exists — only drift
  }

  test("contract: hMult >= 1") {
    import spark.implicits._
    val df = Seq(("g", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("grp", "ts")
    intercept[IllegalArgumentException] {
      Cusum.dailyUpward(df, "grp", "ts", 0L)
    }
  }
}
