package graft.operators

import graft.SparkSpec

/** Skew.joinCardinality: exact per-key products, the __total__ row,
  * null-key exclusion, topK, loud validation. */
class JoinCardinalitySpec extends SparkSpec {

  private def audit(l: Seq[java.lang.Long], r: Seq[java.lang.Long],
      topK: Int = 20) = {
    import spark.implicits._
    Skew.joinCardinality(l.toDF("k"), "k", r.toDF("k"), "k", topK)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
  }

  test("exact per-key products and the matched-total row") {
    // left: a×2, b×1, c×3; right: a×3, b×2, d×1
    val out = audit(
      Seq[java.lang.Long](1L, 1L, 2L, 3L, 3L, 3L),
      Seq[java.lang.Long](1L, 1L, 1L, 2L, 2L, 4L))
    // matched: 1 -> 2*3=6, 2 -> 1*2=2; c and d never match
    assert(out("1") == ((2L, 3L, 6L)), out)
    assert(out("2") == ((1L, 2L, 2L)), out)
    assert(out("__total__") == ((3L, 5L, 8L)), out)
    assert(out.size == 3, out)
  }

  test("topK keeps the largest explosions; the total still sums ALL") {
    val out = audit(
      Seq[java.lang.Long](1L, 1L, 1L, 2L),
      Seq[java.lang.Long](1L, 1L, 2L), topK = 1)
    assert(out.keySet == Set("1", "__total__"), out)
    assert(out("1") == ((3L, 2L, 6L)), out)
    assert(out("__total__") == ((4L, 3L, 7L)), out)
  }

  test("null keys are excluded from both sides") {
    val out = audit(
      Seq[java.lang.Long](1L, null, null),
      Seq[java.lang.Long](1L, null))
    assert(out("1") == ((1L, 1L, 1L)), out)
    assert(out("__total__") == ((1L, 1L, 1L)), out)
  }

  test("no matching keys: a zeroed total, not a null row") {
    val out = audit(Seq[java.lang.Long](1L), Seq[java.lang.Long](2L))
    assert(out == Map("__total__" -> ((0L, 0L, 0L))), out)
  }

  test("topK validation is loud") {
    import spark.implicits._
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      Skew.joinCardinality(df, "k", df, "k", topK = 0)
    }
  }
}
