package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Anomaly.hourlyRateSpikes: the integer z-test against hand-computed
  * S1/S2 baselines, the sigma-zero case, and the cold-start guard. */
class AnomalySpec extends SparkSpec {

  /** `hour` hours after 2024-01-01 00:00, n events of which k errors. */
  private def hourRows(hour: Int, n: Int, k: Int)
      : Seq[(Timestamp, String)] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until n).map { i =>
      (new Timestamp(base + hour * 3600000L + i * 1000L),
        if (i < k) "error" else "ok")
    }
  }

  private def run(evs: Seq[(Timestamp, String)]) = {
    import spark.implicits._
    Anomaly.hourlyRateSpikes(evs.toDF("ts", "event_type"),
      "ts", "event_type", "error")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))))
      .toMap
  }

  // alternating baseline: even hours 1/10 errors (share 100000), odd
  // hours 2/10 (share 200000) → for hour 24: c=24, S1=3 600 000,
  // S2=6·10¹¹, mean 150000, z²σ² term 9·(24·S2−S1²)=1.296·10¹³
  private val baseline = (0 until 24).flatMap(h =>
    hourRows(h, 10, if (h % 2 == 0) 1 else 2))

  test("3.4-sigma spike flags; 2-sigma wobble doesn't") {
    // hour 24 at share 320000 (8/25): (24x−S1)² = 1.6646·10¹³ > RHS
    val spiked = run(baseline ++ hourRows(24, 25, 8))
    assert(spiked("2024-01-02 00:00:00") ==
      ((320000L, 24L, 150000L, true)), spiked)
    // hour 24 at share 250000 (5/20): (24x−S1)² = 5.76·10¹² < RHS
    val wobble = run(baseline ++ hourRows(24, 20, 5))
    assert(wobble("2024-01-02 00:00:00") ==
      ((250000L, 24L, 150000L, false)), wobble)
  }

  test("sigma-zero baseline: any strict exceedance flags") {
    val flat = (0 until 24).flatMap(h => hourRows(h, 10, 1))
    val out = run(flat ++ hourRows(24, 10, 2))
    assert(out("2024-01-02 00:00:00") ==
      ((200000L, 24L, 100000L, true)), out)
    // equal share: c·x = S1 is not a STRICT exceedance
    val same = run(flat ++ hourRows(24, 10, 1))
    assert(!same("2024-01-02 00:00:00")._4, same)
  }

  test("cold start: under minBaseline hours never flags") {
    val out = run((0 until 5).flatMap(h => hourRows(h, 10, 1)) ++
      hourRows(5, 10, 9))
    val spike = out("2024-01-01 05:00:00")
    assert(spike._2 == 5L && !spike._4, out)
    // the very first hour has no baseline at all
    assert(out("2024-01-01 00:00:00")._2 == 0L)
  }
}
