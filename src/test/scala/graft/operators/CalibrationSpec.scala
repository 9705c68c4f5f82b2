package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Calibration.calibratedKeep vs hand-computed per-group percentiles. */
class CalibrationSpec extends SparkSpec {

  import Calibration.Rule

  // group g1: lens 10,20,30,40,50 — p50 (cont) = 30
  // group g2: lens 1,2,3,4       — p50 (cont) = 2.5
  private val rows = Seq(
    ("g1", 10.0), ("g1", 20.0), ("g1", 30.0), ("g1", 40.0), ("g1", 50.0),
    ("g2", 1.0), ("g2", 2.0), ("g2", 3.0), ("g2", 4.0))

  test("per-group threshold at the requested percentile, keep >= th") {
    import spark.implicits._
    val df = rows.toDF("grp", "len")
    val out = Calibration.calibratedKeep(df, "grp",
        Seq(Rule("sig", col("len"), 0.5, keepAtOrAbove = true)))
      .select("grp", "len", "sig_th", "keep_sig", "keep")
      .orderBy("grp", "len").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byGroup("g1") == Set(30.0), s"g1 th=${byGroup("g1")}")
    assert(byGroup("g2") == Set(2.5), s"g2 th=${byGroup("g2")}")
    // keep is per-group: g1 keeps 30..50, g2 keeps 3,4
    val keptLens = out.filter(_._4 == 1L).map(t => (t._1, t._2)).toSet
    assert(keptLens == Set(("g1", 30.0), ("g1", 40.0), ("g1", 50.0),
      ("g2", 3.0), ("g2", 4.0)), s"kept=$keptLens")
    // single rule → keep == keep_sig everywhere
    assert(out.forall(t => t._4 == t._5))
  }

  test("high-tail rule cuts above the percentile; conjunction combines") {
    import spark.implicits._
    val df = rows.toDF("grp", "len")
    val out = Calibration.calibratedKeep(df, "grp",
        Seq(Rule("lo", col("len"), 0.5, keepAtOrAbove = true),
          Rule("hi", col("len"), 0.75, keepAtOrAbove = false)))
      .orderBy("grp", "len").collect()
    // g1: p50=30, p75=40 → keep band [30,40]; g2: p50=2.5, p75=3.25 → {3}
    val kept = out.filter(_.getAs[Long]("keep") == 1L)
      .map(r => (r.getAs[String]("grp"), r.getAs[Double]("len"))).toSet
    assert(kept == Set(("g1", 30.0), ("g1", 40.0), ("g2", 3.0)),
      s"kept=$kept")
  }

  test("approx path keeps the same contract on exact-representable data") {
    import spark.implicits._
    val df = rows.toDF("grp", "len")
    // at this tiny size approx_percentile is exact for its sketch, but
    // it interpolates differently (nearest-rank) — assert the CONTRACT
    // (per-group thresholds, keep flags consistent with them), not the
    // continuous-interpolation values
    val out = Calibration.calibratedKeep(df, "grp",
        Seq(Rule("sig", col("len"), 0.5, keepAtOrAbove = true)),
        exact = false)
      .orderBy("grp", "len").collect()
    out.foreach { r =>
      val keepBit = r.getAs[Long]("keep_sig")
      val want = if (math.rint(r.getAs[Double]("sig") * 1e4) / 1e4 >=
        math.rint(r.getAs[Double]("sig_th") * 1e4) / 1e4) 1L else 0L
      assert(keepBit == want)
    }
  }

  test("rejects clashing output columns and bad percentiles") {
    import spark.implicits._
    val df = rows.toDF("grp", "keep")
    val e = intercept[IllegalArgumentException] {
      Calibration.calibratedKeep(df, "grp",
        Seq(Rule("sig", col("keep"), 0.5, keepAtOrAbove = true)))
    }
    assert(e.getMessage.contains("keep"))
    val e2 = intercept[IllegalArgumentException] {
      Calibration.calibratedKeep(rows.toDF("grp", "len"), "grp",
        Seq(Rule("sig", col("len"), 1.5, keepAtOrAbove = true)))
    }
    assert(e2.getMessage.contains("pct"))
  }
}
