package graft.operators

import graft.SparkSpec

/** Skew.keyProfile: section math, top-key ordering/tie-break, bucket
  * mass conservation, and the straggler summary. */
class SkewProfileSpec extends SparkSpec {

  private def profile(keys: Seq[String], partitions: Int, topK: Int) = {
    import spark.implicits._
    Skew.keyProfile(keys.toDF("k"), "k", partitions, topK)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3))))
  }

  test("top keys carry exact shares; ties break by key") {
    // hot: 6 of 10 rows; warm and cool tie at 2 — "cool" < "warm"
    val keys = Seq.fill(6)("hot") ++ Seq.fill(2)("warm") ++
      Seq.fill(2)("cool")
    val out = profile(keys, 4, 2).toMap
    assert(out(("key", "hot")) == ((6L, 600000L)), out)
    assert(out.contains(("key", "cool")) && !out.contains(("key", "warm")),
      s"tie must break to the lexicographically smaller key: $out")
  }

  test("buckets conserve mass; summary is the max bucket ratio") {
    val keys = (1 to 100).map(i => s"k$i")
    val rows = profile(keys, 8, 3)
    val buckets = rows.filter(_._1._1 == "bucket")
    assert(buckets.map(_._2._1).sum == 100L, buckets.toSeq)
    val maxRatio = buckets.map(_._2._2).max
    val maxRows = buckets.map(_._2._1).max
    val summary = rows.filter(_._1._1 == "summary")
    assert(summary.length == 1 &&
      summary.head._2 == ((maxRows, maxRatio)), summary.toSeq)
    // ratio 10^6 == the mean: uniform-ish keys must straddle it
    assert(maxRatio >= 1000000L, s"max bucket ratio $maxRatio below mean")
  }

  test("validation: degenerate partitions/topK are loud") {
    import spark.implicits._
    val df = Seq("a").toDF("k")
    intercept[IllegalArgumentException] { Skew.keyProfile(df, "k", 1, 1) }
    intercept[IllegalArgumentException] { Skew.keyProfile(df, "k", 4, 0) }
  }
}
