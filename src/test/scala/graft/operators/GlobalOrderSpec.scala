package graft.operators

import graft.SparkSpec

/** GlobalOrder.positions == the driver-side sort's 1-based ranks,
  * including key collisions (id tie-break), skewed prefixes, null
  * exclusion, and the loud bucket guard. */
class GlobalOrderSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)], bucketChars: Int = 2,
      maxBucket: Long = 1L << 22) = {
    import spark.implicits._
    GlobalOrder.positions(rows.toDF("id", "k"), "id", "k",
        bucketChars = bucketChars, superChars = 1, maxBucket = maxBucket)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("pos")).toMap
  }

  private def brute(rows: Seq[(Long, String)]) =
    rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap

  test("dense exact ranks with ties and uneven prefixes") {
    val rows = (0L until 41L).map(i =>
      (i, f"${(i * 7) % 10}%d${(i * 13) % 5}%dz"))
    assert(run(rows) == brute(rows))
  }

  test("skew: one hot prefix still ranks exactly") {
    val rows = (0L until 30L).map(i =>
      (i, if (i < 27) f"aa$i%02d" else f"b$i%02d"))
    assert(run(rows) == brute(rows))
  }

  test("null keys are excluded; the rest stays dense") {
    import spark.implicits._
    val df = Seq((1L, Some("b")), (2L, None), (3L, Some("a")))
      .toDF("id", "k")
    val out = GlobalOrder.positions(df, "id", "k", 2, 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("pos")).toMap
    assert(out == Map(3L -> 1L, 1L -> 2L))
  }

  test("oversized bucket fails loudly") {
    val rows = (0L until 9L).map(i => (i, f"aa$i%d"))
    val e = intercept[Exception] { run(rows, maxBucket = 3L) }
    assert(e.getMessage.contains("maxBucket"), e.getMessage)
  }
}
