package graft.operators

import graft.SparkSpec

/** ClassifierCalibration.reliabilityReport vs hand-computed bins. */
class ClassifierCalibrationSpec extends SparkSpec {

  // σ(2) = 0.880797 (6dp) → bin 8; σ(0) = 0.5 → bin 5; σ(6) = 0.997527
  // → bin 9. Rows: (llr, pred, label)
  private def scored = {
    import spark.implicits._
    Seq(
      (2.0, true, 1L),   // bin 8, correct
      (2.0, true, 0L),   // bin 8, wrong
      (-2.0, false, 0L), // bin 8 (conf = 1 − σ(−2) = 0.880797), correct
      (0.0, false, 1L),  // bin 5, wrong
      (6.0, true, 1L))   // bin 9, correct
      .toDF("llr", "pred", "label")
  }

  test("bins, accuracy, gaps and ECE match hand computation") {
    val out = ClassifierCalibration.reliabilityReport(scored)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.map(_._1).toSeq == Seq(5L, 8L, 9L))
    val Array(b5, b8, b9) = out
    assert(b5 == (5L, 1L, 0L, 0.5, 0.0, 0.5, 0.228973), s"b5=$b5")
    // acc = (2·2e6 + 3) DIV 6 / 1e6 = 0.666667 (half-up integer div)
    assert(b8 == (8L, 3L, 2L, 0.880797, 0.666667, 0.21413, 0.228973),
      s"b8=$b8")
    assert(b9 == (9L, 1L, 1L, 0.997527, 1.0, 0.002473, 0.228973),
      s"b9=$b9")
    // ECE = (1·0.5 + 3·0.21413 + 1·0.002473) / 5 = 0.228973 on all rows
  }

  test("conf of exactly 1.0 clamps into bin 9; perfect bins have gap = mean_conf distance") {
    import spark.implicits._
    val df = Seq((40.0, true, 1L), (40.0, true, 1L))
      .toDF("llr", "pred", "label")
    val rows = ClassifierCalibration.reliabilityReport(df).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 9L, s"bin ${r.getLong(0)}")
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0
      && r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0)
  }

  test("prediction column decides the confidence side, not the llr sign") {
    import spark.implicits._
    // llr rounded to 0.0 but exact-decimal pred said true: conf = σ(0) = 0.5
    val df = Seq((0.0, true, 1L)).toDF("llr", "pred", "label")
    val r = ClassifierCalibration.reliabilityReport(df).collect().head
    assert(r.getLong(0) == 5L && r.getDouble(4) == 1.0)
  }
}
