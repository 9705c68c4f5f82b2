package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benford.firstDigitReport: hand-computed digit counts/shares, the
  * zero/null domain exclusion, the integral-dtype contract. */
class BenfordSpec extends SparkSpec {

  test("hand-computed digits, shares, and deviations") {
    import spark.implicits._
    // digits over non-zero/non-null: 1,19,100 -> d1 x3; 2,-25 -> d2 x2
    val df = Seq[java.lang.Long](1L, 19L, 100L, 2L, -25L, 0L, null)
      .toDF("v")
    val out = Benford.firstDigitReport(df, Seq("v" -> col("v")))
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == Map(
      1 -> ((3L, 600000L, 301029L, 298971L)),
      2 -> ((2L, 400000L, 176091L, 223909L))), out)
  }

  test("a genuinely logarithmic column tracks the expected shares") {
    import spark.implicits._
    // 1..9999: first-digit counts are 1111 each of 9999 -> ~111100
    // micro for every digit, far from Benford on d1 — while powers of
    // a constant ratio (here 1.5^k) hug the law
    val pow = (0 until 60).map(k => math.pow(1.5, k).toLong)
      .filter(_ > 0).toDF("v")
    val rep = Benford.firstDigitReport(pow, Seq("v" -> col("v")))
      .collect().map(r => r.getInt(1) -> r.getLong(5)).toMap
    // every digit's deviation stays under 6% on the log-spaced fixture
    assert(rep.values.forall(_ < 60000L), rep)
    assert(rep.keySet == (1 to 9).toSet, rep)
  }

  test("non-integral columns are refused, not silently truncated") {
    import spark.implicits._
    val df = Seq(1.5, 2.5).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Benford.firstDigitReport(df, Seq("v" -> col("v")))
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("empty and duplicate column lists are refused") {
    import spark.implicits._
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException] {
      Benford.firstDigitReport(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Benford.firstDigitReport(df,
        Seq("v" -> col("v"), "v" -> col("v")))
    }
  }
}
