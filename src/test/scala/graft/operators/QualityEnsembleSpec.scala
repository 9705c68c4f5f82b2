package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** QualityEnsemble.zscoreComposite vs hand-computed moments. */
class QualityEnsembleSpec extends SparkSpec {

  test("z-scores match hand-computed population moments per group") {
    import spark.implicits._
    // g1 signal a: 1,2,3 → mean 2, var 2/3, sd 0.816497
    val df = Seq((1L, "g1", 1.0), (2L, "g1", 2.0), (3L, "g1", 3.0),
      (4L, "g2", 10.0), (5L, "g2", 30.0))
      .toDF("id", "grp", "a")
    val out = QualityEnsemble.zscoreComposite(df, "id", "grp",
      Seq("a" -> col("a"))).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    val sd1 = math.sqrt(2.0 / 3.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0)._2 == r6(-1.0 / sd1), s"${out(0)}")
    assert(out(1)._2 == 0.0)
    assert(out(2)._2 == r6(1.0 / sd1))
    // g2: mean 20 sd 10 → z = ±1
    assert(out(3)._2 == -1.0 && out(4)._2 == 1.0)
    // single signal: composite == its z
    out.foreach { case (_, z, c) => assert(z == c) }
  }

  test("composite averages the per-signal z-scores") {
    import spark.implicits._
    val df = Seq((1L, "g", 1.0, 100.0), (2L, "g", 2.0, 200.0),
      (3L, "g", 3.0, 300.0)).toDF("id", "grp", "a", "b")
    val out = QualityEnsemble.zscoreComposite(df, "id", "grp",
      Seq("a" -> col("a"), "b" -> col("b"))).orderBy("id").collect()
    // a and b are perfectly correlated → identical z → composite == z_a
    out.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3))
      assert(r.getDouble(4) == r.getDouble(2))
    }
  }

  test("zero-variance and singleton groups z-score to 0, never NaN") {
    import spark.implicits._
    val df = Seq((1L, "c", 5.0), (2L, "c", 5.0), (3L, "solo", 7.0))
      .toDF("id", "grp", "a")
    val out = QualityEnsemble.zscoreComposite(df, "id", "grp",
      Seq("a" -> col("a"))).collect()
    out.foreach { r =>
      assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0, s"$r")
    }
  }

  test("duplicate signal names refused") {
    import spark.implicits._
    val df = Seq((1L, "g", 1.0)).toDF("id", "grp", "a")
    intercept[IllegalArgumentException] {
      QualityEnsemble.zscoreComposite(df, "id", "grp",
        Seq("a" -> col("a"), "a" -> col("a")))
    }
  }
}
