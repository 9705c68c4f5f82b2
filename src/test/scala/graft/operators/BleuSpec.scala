package graft.operators

import graft.SparkSpec

/** Bleu.scorePairs: hand-computed clipped precisions, geometric mean,
  * brevity penalty, and the short-candidate drop. */
class BleuSpec extends SparkSpec {

  private def score(pairs: Seq[(Long, Long)], docs: Seq[(Long, String)])
      : Map[(Long, Long), (Long, Long, Long, Long, Long, Double, Double)] = {
    import spark.implicits._
    Bleu.scorePairs(pairs.toDF("doc_a", "doc_b"),
      docs.toDF("doc_id", "text"), "doc_a", "doc_b", "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7), r.getDouble(8)))
      .toMap
  }

  test("clipped counts: a repeated shared word scores true overlap") {
    // cand "the cat the cat" vs ref "the cat sat":
    //   p1 = clip(the:min(2,1), cat:min(2,1)) / 4     = 500000 micro
    //   p2 = clip(the_cat:min(2,1), cat_the:0) / 3    = 333333 micro
    //   geo = floor(sqrt(500000*333333))              = 408248
    //   bp  = 1 (candidate longer than reference)
    val out = score(Seq(1L -> 2L),
      Seq(1L -> "the cat the cat", 2L -> "the cat sat"))
    assert(out((1L, 2L)) == ((4L, 3L, 500000L, 333333L, 408248L,
      1.0, 0.408248)))
  }

  test("brevity penalty punishes a short candidate") {
    // cand "a b" (perfect precision) vs ref "a b c d": bp = exp(1-4/2)
    val out = score(Seq(1L -> 2L), Seq(1L -> "a b", 2L -> "a b c d"))
    assert(out((1L, 2L)) == ((2L, 4L, 1000000L, 1000000L, 1000000L,
      0.367879, 0.367879)))
  }

  test("disjoint texts score zero; sub-2-token candidates are dropped") {
    val out = score(Seq(1L -> 2L, 3L -> 2L),
      Seq(1L -> "x y z", 2L -> "p q r", 3L -> "only"))
    assert(out((1L, 2L)) == ((3L, 3L, 0L, 0L, 0L, 1.0, 0.0)))
    assert(!out.contains((3L, 2L)), "1-token candidate has no bigrams")
  }
}
