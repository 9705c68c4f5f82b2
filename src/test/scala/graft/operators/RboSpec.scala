package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rbo.truncated: identical rankings pin RBO to Σ(1−p)p^{d−1} (→ the
  * truncated-mass identity), disjoint rankings pin 0, a known
  * single-swap case matches the hand-computed series, and the weights
  * stay exact through the decimal pipeline (the (38,18)×long
  * precision-loss regression). */
class RboSpec extends SparkSpec {

  private def docs(keys: Seq[(Long, String, String)]) = {
    import spark.implicits._
    keys.toDF("id", "ka", "kb")
  }

  // expected truncated RBO in micro units, from the same driver math
  private def expect(ms: Seq[Int], p: Double, k: Int): Long = {
    val terms = (1 to k).map { d =>
      val xd = ms.count(_ <= d)
      BigDecimal((1 - p) * math.pow(p, d - 1) / d)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP) * xd
    }
    (terms.sum * 1000000).setScale(0, BigDecimal.RoundingMode.FLOOR)
      .toLong
  }

  test("identical rankings: X_d = d, per-depth terms match the series") {
    val d = docs((1L to 30L).map(i => (i, f"$i%04d", f"$i%04d")))
    val out = Rbo.truncated(d, "id", "ka", "kb", 900000L, 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    (1 to 10).foreach { dd => assert(out(dd.toLong)._1 == dd.toLong) }
    assert(out(-1L)._1 == 10L) // X_k on the summary row
    assert(out(-1L)._2 == expect((1 to 30).map(identity), 0.9, 10))
  }

  test("disjoint top-k: RBO 0; a swap inside the top matches hand math") {
    // ka ranks 1..6 by id; kb reverses — top-3 sets disjoint at d=1..2
    val rev = docs((1L to 6L).map(i => (i, f"$i%02d", f"${7 - i}%02d")))
    val outR = Rbo.truncated(rev, "id", "ka", "kb", 900000L, 3)
      .filter(col("d") === -1L).head()
    // m = max(r, 7-r) = 6,5,4,4,5,6 -> X_1=X_2=0, X_3=0
    assert(outR.getLong(1) == 0L && outR.getLong(2) == 0L)
    // swap ranks 1 and 2 only: m = (2,2,3,4,5) -> X_1=0, X_2=2, X_3=3...
    val swap = docs(Seq((1L, "02", "01"), (2L, "01", "02"),
      (3L, "03", "03"), (4L, "04", "04"), (5L, "05", "05")))
    val got = Rbo.truncated(swap, "id", "ka", "kb", 900000L, 4)
      .filter(col("d") === -1L).head().getLong(2)
    assert(got == expect(Seq(2, 2, 3, 4, 5), 0.9, 4), got)
  }

  test("weights survive the decimal pipeline exactly (no scale-6 rounding)") {
    // d=8 weight 0.0059787113 (HALF_UP of ...1125) times X=7 is
    // 0.0418509791 -> floor micro 41850; the (38,18)-weight bug read
    // 41851 (product silently rounded to 0.041851 at scale 6)
    // docs 1..7 agree on top ranks; the tail is REVERSED in B so no
    // tail doc reaches the top-8 of both orderings
    val d = docs((1L to 7L).map(i => (i, f"$i%02d", f"$i%02d")) ++
      (8L to 60L).map(i => (i, f"$i%02d", f"${260 - i}%03d")))
    val row = Rbo.truncated(d, "id", "ka", "kb", 900000L, 8)
      .filter(col("d") === 8L).head()
    assert(row.getLong(1) == 7L, "X_8 should be the 7 agreeing docs")
    assert(row.getLong(2) == 41850L, s"term_micro ${row.getLong(2)}")
  }
}
