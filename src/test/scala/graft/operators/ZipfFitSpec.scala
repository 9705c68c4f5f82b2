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

  test("vocabCoverage: dense grid, hand-computed coverage, saturation") {
    // counts: a=6 b=3 c=2 d=1 (12 tokens, 4 types); thresholds 1,2,10
    val out = ZipfFit.vocabCoverage(
      corpusOf(Map("a" -> 6, "b" -> 3, "c" -> 2, "d" -> 1)),
      "text", "source", Seq(1, 2, 10)).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.size == 3, "dense grid: every threshold row present")
    assert(out(1L) == ((1L, 6L, 500000L)))   // top-1 = a: 6/12
    assert(out(2L) == ((2L, 9L, 750000L)))   // +b: 9/12
    assert(out(10L) == ((4L, 12L, 1000000L))) // saturated at 4 types
  }

  test("vocabCoverage: per-source independence and tie-break by word") {
    import spark.implicits._
    val df = (Seq.fill(2)(("x", "s1")) ++ Seq.fill(2)(("y", "s1")) ++
      Seq.fill(5)(("z", "s2"))).toDF("text", "source")
    val out = ZipfFit.vocabCoverage(df, "text", "source", Seq(1))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // s1: tie x/y broken by word -> x (2 of 4) = 500000; s2: z = all
    assert(out == Map("s1" -> 500000L, "s2" -> 1000000L))
  }

  test("heapsReport: hand-computed growth fit (beta exactly 0.5)") {
    import spark.implicits._
    // docs rank 1..4; curve at power-of-two ranks (1,2,4):
    //   (ctok,ctyp) = (2,2),(4,3),(8,4) -> milli-logs
    //   x = 693,1386,2079  y = 693,1099,1386
    //   mx=1386 my=1059 sxy=480249 sxx=960498 -> beta = 500000 micro
    //   ln_k = 1059 - (500000*1386) div 1e6 = 366 milli
    val df = Seq((1L, "a b", "s"), (2L, "a c", "s"), (3L, "a b", "s"),
      (4L, "d d", "s")).toDF("doc_id", "text", "source")
    val r = ZipfFit.heapsReport(df, "doc_id", "text", "source")
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 8L, 4L, 3L)), "n_docs, n_tokens, n_types, k_points")
    assert(r.getLong(5) == 500000L, "beta_micro")
    assert(r.getLong(6) == 366L, "ln_k_milli")
  }

  test("heapsReport: non-power-of-two last rank is a sample point") {
    import spark.implicits._
    val df = (1L to 5L).map(i => (i, s"w$i x", "s"))
      .toDF("doc_id", "text", "source")
    val r = ZipfFit.heapsReport(df, "doc_id", "text", "source")
      .collect().head
    assert(r.getLong(1) == 5L && r.getLong(4) == 4L,
      "ranks 1,2,4 plus the final rank 5")
  }

  test("heapsReport: single-doc source reports null fit, not an error") {
    import spark.implicits._
    val df = Seq((7L, "a b c", "solo")).toDF("doc_id", "text", "source")
    val r = ZipfFit.heapsReport(df, "doc_id", "text", "source")
      .collect().head
    assert(r.getLong(4) == 1L && r.isNullAt(5) && r.isNullAt(6))
  }

  test("heapsReport: sources fit independently") {
    import spark.implicits._
    // "open" never repeats a word (beta -> 1); "closed" repeats one
    // word forever (vocab flat after rank 1)
    val open = (1L to 8L).map(i => (i, s"o$i p$i", "open"))
    val closed = (11L to 18L).map(i => (i, "z z", "closed"))
    val out = ZipfFit.heapsReport((open ++ closed)
        .toDF("doc_id", "text", "source"), "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(out("open") > 900000L, s"open-vocab beta ~1: ${out("open")}")
    assert(out("closed") == 0L, "closed vocab: flat type curve")
  }

  test("vocabCoverage threshold validation") {
    val df = corpusOf(Map("a" -> 1))
    intercept[IllegalArgumentException] {
      ZipfFit.vocabCoverage(df, "text", "source", Seq(10, 5))
    }
    intercept[IllegalArgumentException] {
      ZipfFit.vocabCoverage(df, "text", "source", Seq(0, 5))
    }
    intercept[IllegalArgumentException] {
      ZipfFit.vocabCoverage(df, "text", "source", Nil)
    }
  }
}
