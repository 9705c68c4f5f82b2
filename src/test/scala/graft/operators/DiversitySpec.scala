package graft.operators

import graft.SparkSpec

/** Diversity.report vs hand-computed counts/entropy. */
class DiversitySpec extends SparkSpec {

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("counts, ratios and entropy match hand computation") {
    import spark.implicits._
    // src "rep": tokens a a a b (N=4, distinct 2, counts {a:3, b:1});
    //   bigrams "a a","a a","a b" → 3 total, 2 distinct
    //   H = ln4 − (3·ln3 + 1·ln1)/4
    // src "div": tokens x y (N=2, distinct 2), 1 bigram, H = ln2
    val df = Seq((1L, "a a a b", "rep"), (2L, "x y", "div"))
      .toDF("doc_id", "text", "source")
    val out = Diversity.report(df, "doc_id", "text", "source")
      .orderBy("source").collect()
    val d = out(0); val r = out(1)
    assert(r.getString(0) == "rep" && d.getString(0) == "div")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (1L, 4L, 2L))
    assert(r.getDouble(4) == 0.5)                 // ttr 2/4
    assert((r.getLong(5), r.getLong(6)) == (3L, 2L))
    assert(r.getDouble(7) == 0.666667)            // 2/3 micro half-up
    val hRep = r6(r6(math.log(4)) - (3 * r6(math.log(3)) + 0.0) / 4)
    assert(r.getDouble(8) == hRep, s"entropy ${r.getDouble(8)} vs $hRep")
    assert((d.getLong(1), d.getLong(2), d.getLong(3)) == (1L, 2L, 2L))
    assert(d.getDouble(4) == 1.0)
    assert((d.getLong(5), d.getLong(6)) == (1L, 1L))
    assert(d.getDouble(7) == 1.0)
    assert(d.getDouble(8) == r6(r6(math.log(2)) - 0.0 / 2))
  }

  test("a source of single-token docs reports zero bigrams and null distinct2") {
    import spark.implicits._
    val df = Seq((1L, "only", "s"), (2L, "one", "s"))
      .toDF("doc_id", "text", "source")
    val r = Diversity.report(df, "doc_id", "text", "source")
      .collect().head
    assert(r.getLong(5) == 0L && r.getLong(6) == 0L)
    assert(r.isNullAt(7), "distinct2 must be null with no bigrams")
    // two 1-count tokens: H = ln2 − (1·ln1 + 1·ln1)/2 = ln2
    assert(r.getDouble(8) == r6(math.log(2)))
  }

  test("repetitive source scores lower entropy and ttr than diverse one at equal volume") {
    import spark.implicits._
    val rep = (1 to 10).map(i => (i.toLong, "spam spam spam spam", "rep"))
    val div = (11 to 20).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d", "div"))
    val out = Diversity.report((rep ++ div).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(8)))
      .toMap
    assert(out("rep")._1 < out("div")._1)
    assert(out("rep")._2 < out("div")._2)
  }
}
