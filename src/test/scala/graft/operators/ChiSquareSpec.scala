package graft.operators

import graft.SparkSpec

/** ChiSquare.audit: hand-checkable contingency tables — perfect
  * dependence (V=1), exact independence (chi2=0), a known 2×2 value,
  * null-as-category, and multi-pair stacking. */
class ChiSquareSpec extends SparkSpec {

  private def one(rows: Seq[(String, String)], vFlag: Double = 0.1) = {
    import spark.implicits._
    ChiSquare.audit(rows.toDF("a", "b"), Seq(("a", "b")), vFlag)
      .collect().head
  }

  test("perfect dependence: chi2 = N·(min(r,c)-1), V = 1") {
    val r = one(Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y")))
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 10.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
    assert(r.getAs[Boolean]("dependent"))
  }

  test("exact independence: chi2 = 0, V = 0, not dependent") {
    val rows = for (a <- Seq("a", "b"); b <- Seq("c", "d", "e");
      _ <- 1 to 4) yield (a, b)
    val r = one(rows)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
    assert(!r.getAs[Boolean]("dependent"))
    assert(r.getAs[Long]("dof") == 2L) // (2-1)(3-1)
  }

  test("known 2x2: O=[[10,20],[30,40]] gives chi2 = 100/63") {
    // ra=(30,70) cb=(40,60) N=100; chi2 = Σ O²N/(ra·cb) − N
    // = 100·(100/1200 + 400/1800 + 900/2800 + 1600/4200) − 100
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val r = one(rows)
    val expected = BigDecimal(100.0 / 12 + 400.0 / 18 + 900.0 / 28 +
      1600.0 / 42 - 100).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(r.getAs[Double]("chi2") - expected.toDouble) < 2e-6,
      s"${r.getAs[Double]("chi2")} vs $expected")
  }

  test("nulls are their own category, not dropped") {
    import spark.implicits._
    val df = Seq((Some("x"), "p"), (None, "q"), (None, "q"), (Some("x"), "p"))
      .toDF("a", "b")
    val r = ChiSquare.audit(df, Seq(("a", "b"))).collect().head
    assert(r.getAs[Long]("n") == 4L) // null rows counted
    assert(r.getAs[Long]("r") == 2L) // x and __null__
    assert(r.getAs[Double]("cramers_v") == 1.0) // null ⟷ q exactly
  }

  test("multiple pairs stack from one input") {
    import spark.implicits._
    val df = Seq(("x", "x", "p"), ("y", "y", "q"), ("x", "x", "q"))
      .toDF("a", "b", "c")
    val out = ChiSquare.audit(df, Seq(("a", "b"), ("a", "c")))
      .collect().map(r => r.getAs[String]("pair") -> r).toMap
    assert(out.keySet == Set("a~b", "a~c"))
    assert(out("a~b").getAs[Double]("cramers_v") == 1.0)
    assert(out("a~c").getAs[Double]("cramers_v") < 1.0)
  }
}
