package graft.operators

import graft.SparkSpec

/** Chrf.scorePairs: hand-computed gram overlaps, per-order F2 micros,
  * whitespace stripping, repeated-char clipping, and the short drop. */
class ChrfSpec extends SparkSpec {

  private def score(pairs: Seq[(Long, Long)], docs: Seq[(Long, String)])
      : Map[(Long, Long), Seq[Long]] = {
    import spark.implicits._
    Chrf.scorePairs(pairs.toDF("doc_a", "doc_b"),
      docs.toDF("doc_id", "text"), "doc_a", "doc_b", "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (2 to 10).map(r.getLong).toSeq)
      .toMap
  }

  test("hand-computed chrF2 with whitespace stripping") {
    // "ab cd" strips to "abcd"; vs "abce":
    //   1-grams ov 3 of 4/4: p=r=750000, F = 5p²/5p = p    = 750000
    //   2-grams ov 2 of 3/3 (ab,bc | cd vs ce)             = 666666
    //   3-grams ov 1 of 2/2 (abc | bcd vs bce)             = 500000
    //   chrf = (750000+666666+500000) div 3                = 638888
    val out = score(Seq(1L -> 2L), Seq(1L -> "ab cd", 2L -> "abce"))
    assert(out((1L, 2L)) == Seq(4L, 4L, 3L, 2L, 1L,
      750000L, 666666L, 500000L, 638888L))
  }

  test("repeated chars clip to true overlap; empty order scores zero") {
    // "aaaa" vs "aab":
    //   1-grams: min(4,2)=2; p=2e6 div 4=500000, r=2e6 div 3=666666,
    //     F = 5·500000·666666 div 2666666                  = 624999
    //   2-grams: aa: min(3,1)=1; p=333333, r=500000,
    //     F = 5·333333·500000 div 1833332                  = 454545
    //   3-grams: aaa vs aab → 0 overlap, 4p+r=0 → F = 0
    //   chrf = (624999+454545+0) div 3                     = 359848
    val out = score(Seq(1L -> 2L), Seq(1L -> "aaaa", 2L -> "aab"))
    assert(out((1L, 2L)) == Seq(4L, 3L, 2L, 1L, 0L,
      624999L, 454545L, 0L, 359848L))
  }

  test("disjoint texts score zero; sub-3-char sides are dropped") {
    val out = score(Seq(1L -> 2L, 1L -> 3L),
      Seq(1L -> "abc", 2L -> "xyz", 3L -> "ab"))
    assert(out((1L, 2L)) == Seq(3L, 3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(!out.contains((1L, 3L)), "2-char side has no trigrams")
  }

  test("fuzz: native CharGramOverlaps == the HOF clip twin") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(131)
    // alphabet includes astral (surrogate-pair) code points: Spark
    // length()/substr() count code points, so the native expression must
    // gram by code points too — a code-unit indexer diverges here.
    val alphabet = Seq("a", "b", "c", "d", "😀", "𝕏")
    val rows = (1 to 200).map { i =>
      def mk(len: Int) =
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
      (i.toLong, mk(rnd.nextInt(40)), mk(rnd.nextInt(40)))
    }
    val df = rows.toDF("id", "sa", "sb")
    val native = graft.expressions.TextExpressions
      .charGramOverlaps(col("sa"), col("sb"), 3)
    val hof = array((1 to 3).map(n =>
      Chrf.clipHof(Chrf.charGrams(col("sa"), n),
        Chrf.charGrams(col("sb"), n))): _*)
    val bad = df.select(col("id"), native.as("nv"), hof.as("hv"))
      .filter(col("nv") =!= col("hv")).collect()
    assert(bad.isEmpty, s"native != HOF on: ${bad.take(3).mkString(", ")}")
  }
}
