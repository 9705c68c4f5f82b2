package graft.operators

import graft.SparkSpec

/** ZipfFit.zipfReport: hand-verifiable OLS, perfect-Zipf recovery,
  * degenerate heads, topK cap. */
class ZipfFitSpec extends SparkSpec {

  /** One doc per token keeps counts exactly the requested multiset. */
  private def corpusOf(counts: Map[String, Int], source: String = "s") = {
    import spark.implicits._
    counts.toSeq.flatMap { case (w, c) => Seq.fill(c)((w, source)) }
      .toDF("text", "source")
  }

  private def report(counts: Map[String, Int], topK: Int = 500) =
    ZipfFit.zipfReport(corpusOf(counts), "text", "source", topK)
      .collect().head

  /** The operator's integer contract replayed with plain Scala loops —
    * an independent computation path (no Catalyst, no SQL). */
  private def expectedSlope(counts: Seq[Int]): Long = {
    val ranked = counts.sorted(Ordering.Int.reverse).zipWithIndex
    val pts = ranked.map { case (c, i) =>
      (math.round(math.log(i + 1.0) * 1000), math.round(math.log(c) * 1000))
    }
    val n = pts.size
    val mx = pts.map(_._1).sum / n
    val my = pts.map(_._2).sum / n
    val sxy = pts.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
    sxy * 1000000L / sxx
  }

  test("hand fixture: slope, totals, means match the integer contract") {
    val counts = Map("a" -> 8, "b" -> 4, "c" -> 2, "d" -> 1)
    val r = report(counts)
    assert(r.getLong(1) == 4 && r.getLong(2) == 15 && r.getLong(3) == 4)
    assert(r.getLong(4) == expectedSlope(Seq(8, 4, 2, 1)), r.toString)
    // mx = (0 + 693 + 1099 + 1386) / 4 = 794 (truncating)
    assert(r.getLong(5) == 794L && r.getLong(6) == 1039L, r.toString)
  }

  test("perfect 1/r counts recover slope ~ -1.0") {
    val s = report(Map("a" -> 24, "b" -> 12, "c" -> 8, "d" -> 6)).getLong(4)
    assert(s > -1010000L && s < -990000L, s)
  }

  test("uniform head: slope exactly 0 (flat line), not null") {
    val r = report(Map("a" -> 5, "b" -> 5, "c" -> 5))
    assert(!r.isNullAt(4) && r.getLong(4) == 0L, r.toString)
  }

  test("degenerate single-type head: slope is null") {
    val r = report(Map("only" -> 9))
    assert(r.isNullAt(4) && r.getLong(1) == 1, r.toString)
  }

  test("topK caps the fit but not the totals") {
    val counts = (1 to 10).map(i => s"w$i" -> (20 - i)).toMap
    val r = report(counts, topK = 4)
    assert(r.getLong(3) == 4 && r.getLong(1) == 10 &&
      r.getLong(2) == counts.values.sum)
    val sorted = counts.values.toSeq.sorted(Ordering.Int.reverse).take(4)
    assert(r.getLong(4) == expectedSlope(sorted), r.toString)
  }

  test("topK validation") {
    intercept[IllegalArgumentException] {
      ZipfFit.zipfReport(corpusOf(Map("a" -> 1)), "text", "source", 1)
    }
  }
}
