package graft.operators

import graft.SparkSpec

/** SrmCheck.goodnessOfFit: exact fit = 0, a hand-computed mismatch,
  * zero-observed declared buckets, the loud undeclared-bucket guard,
  * and weighted (non-uniform) expectations. */
class SrmCheckSpec extends SparkSpec {

  private def run(obs: Seq[(String, Int)], w: Seq[(String, Long)]) = {
    import spark.implicits._
    val df = obs.flatMap { case (b, n) => Seq.fill(n)(b) }.toDF("bucket")
    SrmCheck.goodnessOfFit(df, "bucket", w).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"),
        r.getAs[Long]("dev_micro"), r.getAs[Double]("chi2")))).toMap
  }

  test("perfect 50/50 fit reads chi2 = 0") {
    val out = run(Seq(("a", 40), ("b", 40)),
      Seq(("a", 1L), ("b", 1L)))
    assert(out("__chi2__") == ((80L, 0L, 0.0)))
    assert(out("a")._2 == 0L)
  }

  test("hand-computed mismatch: 60/40 against 50/50") {
    // E = 50 each: chi2 = 100/50 + 100/50 = 4
    val out = run(Seq(("a", 60), ("b", 40)),
      Seq(("a", 1L), ("b", 1L)))
    assert(out("__chi2__")._3 == 4.0, out("__chi2__"))
    assert(out("a")._2 == 100000L) // +10% in micro
    assert(out("b")._2 == -100000L)
  }

  test("declared-but-unobserved bucket contributes its full E") {
    // 90/0 against 1:1: E=45 each; chi2 = 45 + 45 = 90
    val out = run(Seq(("a", 90)), Seq(("a", 1L), ("b", 1L)))
    assert(out("b")._1 == 0L)
    assert(out("__chi2__")._3 == 90.0, out("__chi2__"))
  }

  test("weighted expectations: 3:1 delivered exactly reads 0") {
    val out = run(Seq(("a", 75), ("b", 25)),
      Seq(("a", 3L), ("b", 1L)))
    assert(out("__chi2__")._3 == 0.0)
  }

  test("an observed bucket outside the declaration fails loudly") {
    val e = intercept[Exception] {
      run(Seq(("a", 10), ("zz", 1)), Seq(("a", 1L), ("b", 1L)))
    }
    assert(e.getMessage.contains("corrupted split"), e.getMessage)
  }
}
