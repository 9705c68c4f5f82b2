package graft.operators

import graft.SparkSpec

/** GlobalOrder.rangeSplitters == the brute-force sorted-rank cut
  * points, including duplicate-heavy keys (a splitter can repeat), the
  * t = 0 empty-part convention, and balance on a uniform key set. */
class RangeSplittersSpec extends SparkSpec {

  private def run(keys: Seq[String], parts: Int) = {
    import spark.implicits._
    GlobalOrder.rangeSplitters(keys.toDF("k"), "k", parts,
        bucketChars = 2, superChars = 1)
      .collect()
      .map(r => r.getAs[Long]("split_idx") ->
        ((r.getAs[Long]("target_rank"), r.getAs[String]("splitter_key"),
          r.getAs[Long]("cum_at")))).toMap
  }

  private def brute(keys: Seq[String], parts: Int) = {
    val sorted = keys.sorted
    val n = sorted.size.toLong
    (1 until parts).flatMap { i =>
      val t = n * i / parts
      if (t == 0) None else Some(i.toLong -> sorted((t - 1).toInt))
    }.toMap
  }

  test("matches brute-force cut points; duplicates can repeat a key") {
    val keys = Seq("aa", "ab", "ab", "ab", "ab", "ba", "bb", "bc",
      "ca", "cb", "cc", "cd")
    val got = run(keys, 4)
    val want = brute(keys, 4)
    assert(got.keySet == want.keySet)
    for ((i, (t, k, cum)) <- got) {
      assert(k == want(i), s"split $i: $k vs ${want(i)}")
      assert(cum >= t && t >= 1, s"split $i interval violated")
    }
  }

  test("uniform keys cut into near-equal parts") {
    val keys = (0 until 64).map(i => f"k$i%02d")
    val got = run(keys, 8)
    assert(got.size == 7)
    for (i <- 1L to 7L) assert(got(i)._1 == 8 * i) // exact eighths
  }

  test("N < parts: zero-rank targets have no splitter row") {
    val got = run(Seq("a1", "b2"), 4)
    // targets: 2*1/4=0 (absent), 2*2/4=1, 2*3/4=1
    assert(!got.contains(1L))
    assert(got(2L)._2 == "a1" && got(3L)._2 == "a1")
  }
}
