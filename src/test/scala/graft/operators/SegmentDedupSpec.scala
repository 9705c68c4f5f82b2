package graft.operators

import graft.SparkSpec

/** SegmentDedup.keepFirst: hand-computed keep-first semantics over
  * non-overlapping segments, tail segments, pass-through, validation. */
class SegmentDedupSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], k: Int = 3,
      minCount: Long = 2L): Map[Long, (String, Long, Long)] = {
    import spark.implicits._
    SegmentDedup.keepFirst(rows.toDF("doc_id", "text"), "doc_id", "text",
      segWords = k, minCount = minCount)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("globally-first occurrence survives; later occurrences are cut") {
    // k=3 segments: doc 1 = [a b c][d e f]; doc 2 = [a b c][x y z];
    // doc 3 = [d e f]. "a b c" repeats (docs 1,2) -> doc 2's copy cut;
    // "d e f" repeats (docs 1,3) -> doc 3's copy cut.
    val out = run(Seq(
      1L -> "a b c d e f",
      2L -> "a b c x y z",
      3L -> "d e f"))
    assert(out(1L) == (("a b c d e f", 2L, 0L)), "first occurrences keep")
    assert(out(2L) == (("x y z", 2L, 1L)))
    assert(out(3L) == (("", 1L, 1L)))
  }

  test("within-doc repeats: first segment keeps, second cut") {
    val out = run(Seq(1L -> "a b c a b c"))
    assert(out(1L) == (("a b c", 2L, 1L)))
  }

  test("partial tail segments dedup too, and no repeats = pass-through") {
    // doc 1 tail [g h] == doc 2 tail [g h] (both at a segment boundary)
    val out = run(Seq(1L -> "a b c g h", 2L -> "p q r g h",
      3L -> "u v w"))
    assert(out(1L) == (("a b c g h", 2L, 0L)))
    assert(out(2L) == (("p q r", 2L, 1L)), "repeated tail cut")
    assert(out(3L) == (("u v w", 1L, 0L)), "unique doc untouched")
  }

  test("keep-first order is (doc, position): earlier doc wins") {
    // the repeated segment sits at position 1 of doc 1 and position 0 of
    // doc 2 — doc 1 still wins because doc order ranks first
    val out = run(Seq(2L -> "z z z m m m", 1L -> "k k k m m m"))
    assert(out(1L)._1 == "k k k m m m")
    assert(out(2L)._1 == "z z z")
  }

  test("minCount above 2 leaves doubly-occurring segments alone") {
    val out = run(Seq(1L -> "a b c", 2L -> "a b c", 3L -> "a b c",
      4L -> "d e f", 5L -> "d e f"), minCount = 3L)
    assert(out(1L) == (("a b c", 1L, 0L)))
    assert(out(2L) == (("", 1L, 1L)), "copies of a triple still cut")
    assert(out(3L) == (("", 1L, 1L)))
    assert(out(4L) == (("d e f", 1L, 0L)))
    assert(out(5L) == (("d e f", 1L, 0L)), "a pair is below minCount=3")
  }

  test("parameter validation") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SegmentDedup.keepFirst(df, "doc_id", "text", segWords = 0)
    }
    intercept[IllegalArgumentException] {
      SegmentDedup.keepFirst(df, "doc_id", "text", minCount = 1L)
    }
  }
}
