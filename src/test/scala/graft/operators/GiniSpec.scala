package graft.operators

import graft.SparkSpec

/** Gini.perGroup: equality = 0, total concentration = 1 - 1/n, a
  * hand-computed middle case, duplicate values through the closed-form
  * rank sum, all-zero groups, and the loud domain guard. */
class GiniSpec extends SparkSpec {

  private def run(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Gini.perGroup(rows.toDF("g", "v"), "g", "v").collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"),
        r.getAs[Long]("total"), r.getAs[Long]("top_share_micro"),
        r.getAs[Double]("gini")))).toMap
  }

  test("equality, concentration, and a hand case") {
    val out = run(
      Seq.fill(4)(("eq", 5L)) ++
        Seq(("cc", 0L), ("cc", 0L), ("cc", 0L), ("cc", 12L)) ++
        Seq(("mid", 1L), ("mid", 2L), ("mid", 3L), ("mid", 4L)))
    assert(out("eq") == ((4L, 20L, 250000L, 0.0)))
    assert(out("cc") == ((4L, 12L, 1000000L, 0.75))) // = 1 - 1/4
    assert(out("mid") == ((4L, 10L, 400000L, 0.25)))
  }

  test("duplicate values flow through the closed-form rank sum") {
    // [2,2,6]: sum(i*x) = 2+4+18 = 24; G = (48-40)/30 = 0.266667
    val out = run(Seq(("g", 2L), ("g", 2L), ("g", 6L)))
    assert(out("g")._4 == 0.266667, out("g"))
  }

  test("all-zero group reports 0; negatives fail loudly") {
    val out = run(Seq(("z", 0L), ("z", 0L)))
    assert(out("z") == ((2L, 0L, 0L, 0.0)))
    val e = intercept[Exception] { run(Seq(("g", -1L))) }
    assert(e.getMessage.contains("null/negative"), e.getMessage)
  }
}
