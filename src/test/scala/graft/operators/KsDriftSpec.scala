package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KsDrift.twoSample: identical slices read D = 0, a hand-computed
  * separation, a shifted distribution that drifts, argmax tie to the
  * smallest key, and the loud empty-slice guard. Plus
  * GlobalOrder.cumulativeSums multi-weight exactness. */
class KsDriftSpec extends SparkSpec {

  private def run(rows: Seq[(Boolean, String)]) = {
    import spark.implicits._
    KsDrift.twoSample(rows.toDF("a", "k"), col("a"), "k").collect().head
  }

  test("identical slices: D = 0, not drifted") {
    val rows = for (k <- Seq("01", "02", "03"); a <- Seq(true, false))
      yield (a, k)
    val r = run(rows)
    assert(r.getAs[Long]("d_micro") == 0L)
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("hand case: disjoint supports read D = 1 and drift") {
    // A all at 01..02, B all at 03..04: at key 02, F_A=1, F_B=0.
    // 20 rows per slice so D = 1 clears the Smirnov line (at n=2 the
    // line sits above 1 — tiny samples can never 'drift', by design)
    val rows = Seq.fill(10)(Seq((true, "01"), (true, "02"),
      (false, "03"), (false, "04"))).flatten
    val r = run(rows)
    assert(r.getAs[Long]("d_micro") == 1000000L)
    assert(r.getAs[String]("at_key") == "02")
    assert(r.getAs[Long]("crit_micro") == 429437L) // 1.358*sqrt(40/400)
    assert(r.getAs[Boolean]("drifted"))
    // and the tiny-sample version must NOT drift
    val tiny = run(Seq((true, "01"), (true, "02"), (false, "03"),
      (false, "04")))
    assert(!tiny.getAs[Boolean]("drifted"))
  }

  test("argmax tie reports the smallest key") {
    // A at 01, B at 03: dev is maximal (=1) at keys 01 and 02... only
    // keys present appear — 01 attains |1*1 - 0*1| = 1, 03 attains 0
    val r = run(Seq((true, "01"), (false, "03")))
    assert(r.getAs[String]("at_key") == "01")
    assert(r.getAs[Long]("d_micro") == 1000000L)
  }

  test("empty slice fails loudly") {
    val e = intercept[Exception] { run(Seq((true, "01"), (true, "02"))) }
    assert(e.getMessage.contains("no CDF"), e.getMessage)
  }

  test("cumulativeSums: multi-weight exact cums under skewed prefixes") {
    import spark.implicits._
    val hist = Seq(("aa", 1L, 10L), ("ab", 2L, 20L), ("b0", 3L, 30L),
      ("zz", 4L, 40L)).toDF("k", "w1", "w2")
    val out = GlobalOrder.cumulativeSums(hist, "k", Seq("w1", "w2"),
        bucketChars = 2, superChars = 1)
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("cum_w1"), r.getAs[Long]("cum_w2")))).toMap
    assert(out == Map("aa" -> ((1L, 10L)), "ab" -> ((3L, 30L)),
      "b0" -> ((6L, 60L)), "zz" -> ((10L, 100L))))
  }
}
