package graft.operators

import graft.SparkSpec

/** Burstiness.interArrival: metronome B = -1, a hand-computed bursty
  * value, the all-zero-gap convention, minGaps filtering, user
  * isolation. */
class BurstinessSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((u, sec), i) =>
        (u, new java.sql.Timestamp(sec * 1000L), i.toLong) }
      .toDF("user_id", "ts", "event_id")
  }

  private def run(rows: Seq[(Long, Long)], minGaps: Long = 2L) =
    Burstiness.interArrival(mk(rows), "user_id", "ts", "event_id", minGaps)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_gaps"),
        r.getAs[Long]("mean_gap_sec_micro"),
        r.getAs[Double]("burstiness"), r.getAs[Double]("cv")))).toMap

  test("metronome: constant gaps read B = -1, cv = 0") {
    val out = run(Seq((1L, 0L), (1L, 10L), (1L, 20L), (1L, 30L)))
    assert(out(1L) == ((3L, 10000000L, -1.0, 0.0)))
  }

  test("bursty: gaps 0,0,0,30 read the hand-computed B") {
    // mu = 7.5, var = (4*900 - 900)/16 = 168.75, sigma = 12.990381...
    // B = 5.490381/20.490381 = 0.267949; cv = 1.732051
    val out = run(Seq((1L, 0L), (1L, 0L), (1L, 0L), (1L, 0L), (1L, 30L)))
    val (n, mean, b, cv) = out(1L)
    assert(n == 4L && mean == 7500000L)
    assert(b == 0.267949, b)
    assert(cv == 1.732051, cv)
  }

  test("all-zero gaps report B = 0, cv = 0 by convention") {
    val out = run(Seq((1L, 5L), (1L, 5L), (1L, 5L)))
    assert(out(1L) == ((2L, 0L, 0.0, 0.0)))
  }

  test("minGaps filters thin users; users are independent") {
    val out = run(Seq((1L, 0L), (1L, 10L), // 1 gap only
      (2L, 0L), (2L, 7L), (2L, 14L)))
    assert(!out.contains(1L))
    assert(out(2L)._3 == -1.0)
    val loose = run(Seq((1L, 0L), (1L, 10L)), minGaps = 1L)
    assert(loose(1L)._1 == 1L)
  }
}
