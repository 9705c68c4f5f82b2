package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force exact Jaccard over distinct word-n-gram sets. */
  private def reference(docs: Seq[(Long, String)], n: Int, t: Double)
      : Map[(Long, Long), Double] = {
    def sh(s: String): Set[String] = {
      val w = s.split(" ")
      if (w.length < n) Set.empty
      else w.sliding(n).map(_.mkString("_")).toSet
    }
    val sets = docs.map { case (id, s) => id -> sh(s) }.toMap
    (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      inter = (sets(a) & sets(b)).size
      if inter > 0
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if j >= t
    } yield (a, b) -> j).toMap
  }

  private def run(docs: Seq[(Long, String)], n: Int, t: Double)
      : Map[(Long, Long), Double] =
    SetSimJoin.jaccardJoinExact(docs.toDF("doc_id", "text"),
      "doc_id", "text", n = n, threshold = t)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap

  test("matches brute-force exact Jaccard, threshold inclusive") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"),      // high overlap with 1
      (3L, "p q r s t u v w"),      // disjoint
      (4L, "a b c d e f g h"),      // identical to 1 (J = 1.0)
      (5L, "a b c d x y z w"))      // partial overlap with 1
    for (t <- Seq(0.2, 0.5, 1.0)) {
      val got = run(docs, 2, t)
      val want = reference(docs, 2, t)
      assert(got.keySet == want.keySet, s"t=$t: got $got want $want")
      for ((k, j) <- want)
        assert(math.abs(got(k) - j) < 1e-12, s"t=$t pair $k")
    }
  }

  test("finds pairs whose overlap is ONLY frequent shingles (the maxDf " +
      "blind spot of jaccardPairs)") {
    // 20 identical docs: every shingle has df 20, so a df-pruned index
    // with maxDf < 20 drops all postings and reports NOTHING. The
    // prefix-filter join is exact and must emit all C(20,2) pairs.
    val docs = (1L to 20L).map(i => (i, "common text repeated verbatim"))
    val pruned = Dedup.jaccardPairs(docs.toDF("doc_id", "text"),
      "doc_id", "text", n = 2, threshold = 0.5, maxDf = 10L).count()
    assert(pruned == 0L, "premise: df-pruned join must miss these")
    val got = run(docs, 2, 0.5)
    assert(got.size == 20 * 19 / 2)
    assert(got.values.forall(j => math.abs(j - 1.0) < 1e-12))
  }

  test("shingleless (short) docs never pair; empty result is empty") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c d"))
    assert(run(docs, 4, 0.5).isEmpty)
  }

  test("prefix length formula survives threshold 1.0 and fp boundaries") {
    // t=0.3, |x|=10 puts t·|x| on a double representation boundary
    // (3.0000000000000004); the slack must keep the prefix long enough
    val words = ('a' to 'k').map(_.toString)   // 11 words → 10 2-shingles
    val base = words.mkString(" ")
    val docs = Seq((1L, base), (2L, base))
    val got = run(docs, 2, 0.3)
    assert(got.keySet == Set((1L, 2L)))
  }
}
