package graft.operators

import graft.SparkSpec

/** SortedNeighborhood.candidatePairs == the brute-force sliding window
  * over the global (key, id) sort order — including pairs that straddle
  * segment boundaries and prefix-bucket boundaries — plus the loud
  * oversized-bucket guard and the null-key exclusion. */
class SortedNeighborhoodSpec extends SparkSpec {

  private def brute(rows: Seq[(Long, String)], w: Int) = {
    val sorted = rows.sortBy { case (id, k) => (k, id) }
    (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + w, sorted.size)
    } yield (sorted(i)._1, sorted(j)._1, (j - i).toLong)).toSet
  }

  private def run(rows: Seq[(Long, String)], w: Int, segSize: Long = 8L,
      bucketChars: Int = 2, maxBucket: Long = 1L << 22) = {
    import spark.implicits._
    SortedNeighborhood.candidatePairs(rows.toDF("id", "k"), "id", "k",
        window = w, bucketChars = bucketChars, superChars = 1,
        segSize = segSize, maxBucket = maxBucket)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getAs[Long]("dist")))
      .toSet
  }

  test("matches brute force across segment and bucket boundaries") {
    // 37 rows with tiny segments and a window that straddles them;
    // keys collide (ties broken by id) and share prefixes unevenly
    val rows = (0L until 37L).map(i =>
      (i, f"${(i * 7) % 10}%d${(i * 13) % 5}%dk"))
    for (w <- Seq(2, 3, 4)) {
      val got = run(rows, w)
      assert(got == brute(rows, w), s"window=$w")
    }
  }

  test("skewed prefixes: one hot bucket still matches brute force") {
    val rows = (0L until 30L).map(i =>
      (i, if (i < 25) f"aa$i%02d" else f"zz$i%02d"))
    val got = run(rows, 4, segSize = 8L)
    assert(got == brute(rows, 4))
  }

  test("null keys are excluded from the order; the rest still pairs") {
    import spark.implicits._
    val df = Seq((1L, Some("a1")), (2L, None), (3L, Some("a2")))
      .toDF("id", "k")
    val got = SortedNeighborhood.candidatePairs(df, "id", "k", window = 2,
        bucketChars = 2, segSize = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((1L, 3L)))
  }

  test("an oversized single-prefix bucket fails loudly") {
    val rows = (0L until 12L).map(i => (i, f"aaaa$i%03d"))
    val e = intercept[Exception] {
      run(rows, 3, maxBucket = 4L)
    }
    assert(e.getMessage.contains("maxBucket"), e.getMessage)
  }

  test("parameter contracts are enforced") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      SortedNeighborhood.candidatePairs(df, "id", "k", window = 1)
    }
    intercept[IllegalArgumentException] {
      SortedNeighborhood.candidatePairs(df, "id", "k", window = 8,
        segSize = 14L)
    }
    intercept[IllegalArgumentException] { // odd segSize breaks the tiling
      SortedNeighborhood.candidatePairs(df, "id", "k", window = 4,
        segSize = 9L)
    }
  }
}
