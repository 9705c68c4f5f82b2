package graft.operators

import graft.SparkSpec

/** AbTest.conversionReport: hand-computed pooled z-test at 2 sigma,
  * user-level dedup (chatty users count once), the zero-conversion
  * degenerate case, and the empty-arm guard. */
class AbTestSpec extends SparkSpec {

  /** control users 1..100, treatment 101..200; converters fire `m`. */
  private def rows(xc: Int, xt: Int): Seq[(Long, Boolean, String)] = {
    val convert = (1 to xc).map(u => (u.toLong, false, "m")) ++
      (101 to 100 + xt).map(u => (u.toLong, true, "m"))
    val noise = (1 to 200).map(u => (u.toLong, u > 100, "visit"))
    convert ++ noise
  }

  private def run(rs: Seq[(Long, Boolean, String)]) = {
    import spark.implicits._
    AbTest.conversionReport(rs.toDF("user_id", "treat", "event_type"),
      "user_id", "treat", "event_type")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getBoolean(8))))
      .toMap
  }

  test("25% vs 10% on n=100/arm is significant; 15% vs 10% is not") {
    // (1000-2500)^2*200 = 4.5e8 > 4*35*165*1e4 = 2.31e8 (z ~ 2.79)
    val sig = run(rows(xc = 10, xt = 25))("m")
    assert(sig == ((100L, 10L, 100L, 25L, 100000L, 250000L, 150000L,
      true)), sig)
    // (1000-1500)^2*200 = 5e7 < 4*25*175*1e4 = 1.75e8 (z ~ 1.09)
    val ns = run(rows(xc = 10, xt = 15))("m")
    assert(ns._8 == false && ns._7 == 50000L, ns)
  }

  test("a chatty converter counts once; every user counts in the arm") {
    val dup = rows(xc = 10, xt = 25) ++ Seq((1L, false, "m"),
      (1L, false, "m"))
    val out = run(dup)("m")
    assert(out._2 == 10L && out._1 == 100L, out)
  }

  test("zero conversions in both arms: 0 > 0 is false, no crash") {
    val out = run(rows(xc = 0, xt = 0))
    assert(!out.contains("m") ||
      (out("m")._2 == 0L && !out("m")._8), out)
    assert(!out("visit")._8, out)   // 100% vs 100%: diff 0
  }

  test("an empty arm is loud") {
    import spark.implicits._
    val df = Seq((1L, false, "m")).toDF("user_id", "treat", "event_type")
    intercept[IllegalArgumentException] {
      AbTest.conversionReport(df, "user_id", "treat", "event_type")
    }
  }

  test("a null arm assignment is loud, not an NPE or a silent drop") {
    import spark.implicits._
    val df = Seq((1L, Some(false), "m"), (2L, Some(true), "m"),
      (3L, None, "m"))
      .toDF("user_id", "treat", "event_type")
    val e = intercept[IllegalArgumentException] {
      AbTest.conversionReport(df, "user_id", "treat", "event_type")
    }
    assert(e.getMessage.contains("nulls"), e.getMessage)
  }

  test("exactness precheck: 3e7/arm fits DECIMAL(38,0), 1e8 does not") {
    AbTest.requireExact(30000000L, 30000000L, 2)        // worst ~ 4.9e37
    val e = intercept[IllegalArgumentException] {
      AbTest.requireExact(100000000L, 100000000L, 2)    // worst ~ 2e40
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }
}
