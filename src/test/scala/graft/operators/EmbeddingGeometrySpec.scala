package graft.operators

import graft.SparkSpec

/** EmbeddingGeometry.report: hand-computed integer means/variances and
  * the anisotropy ratio, the collapsed and centered extremes, the
  * zero-vector guard, and truncating-div sign behavior. */
class EmbeddingGeometrySpec extends SparkSpec {

  private def run(rows: Seq[(String, Seq[Float])]) = {
    import spark.implicits._
    EmbeddingGeometry.report(rows.toDF("label", "embedding"),
      "embedding", "label")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2),
          if (r.isNullAt(3)) null else Long.box(r.getLong(3)),
          if (r.isNullAt(4)) null else Long.box(r.getLong(4)),
          if (r.isNullAt(5)) null else Long.box(r.getLong(5)))))
      .toMap
  }

  test("hand-computed means, variances, anisotropy") {
    // dim0: e = 1000, 3000 -> m 2000, ss 2e6, var_e8 1e6
    // dim1: e = -2000, -2000 -> m -2000, ss 0, var 0
    // aniso: num = 8e6, den = (10e6 + 8e6) div 2 = 9e6 -> 888888
    val out = run(Seq(("a", Seq(0.1f, -0.2f)), ("a", Seq(0.3f, -0.2f))))
    assert(out(("a", 0L)) == ((2L, 2000L, 1000000L, null)), out)
    assert(out(("a", 1L)) == ((2L, -2000L, 0L, null)), out)
    assert(out(("a", -1L)) == ((2L, null, null, 888888L)), out)
  }

  test("collapsed group reads 1.0; centered group reads 0") {
    val out = run(Seq(
      ("c", Seq(0.5f, 0.25f)), ("c", Seq(0.5f, 0.25f)),   // identical
      ("z", Seq(0.4f, -0.3f)), ("z", Seq(-0.4f, 0.3f)))) // +v / -v
    assert(out(("c", -1L))._4 == 1000000L, out)
    assert(out(("z", -1L))._4 == 0L, out)                // num = 0
    assert(out(("z", 0L)) == ((2L, 0L, 16000000L, null)), out)
  }

  test("all-zero vectors: den = 0 guard yields 0, not an error") {
    val out = run(Seq(("n", Seq(0f, 0f)), ("n", Seq(0f, 0f))))
    assert(out(("n", -1L))._4 == 0L, out)
    assert(out(("n", 0L)) == ((2L, 0L, 0L, null)), out)
  }

  test("negative means truncate toward zero (div parity)") {
    // e = -1000, -2000, -2000 -> s1 = -5000, m = -5000 div 3 = -1666
    val out = run(Seq(("t", Seq(-0.1f)), ("t", Seq(-0.2f)),
      ("t", Seq(-0.2f))))
    assert(out(("t", 0L))._2 == -1666L, out)
  }

  test("bad unitScale is loud") {
    import spark.implicits._
    val df = Seq(("a", Seq(0.1f))).toDF("label", "embedding")
    intercept[IllegalArgumentException] {
      EmbeddingGeometry.report(df, "embedding", "label", unitScale = 0)
    }
  }
}
