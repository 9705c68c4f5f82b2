package graft.operators

import graft.SparkSpec

/** Dedup.savingsReport: hand-built clusters, keep-first byte math, the
  * -1 totals row, and the loud null contracts. */
class SavingsReportSpec extends SparkSpec {

  test("histogram and totals match hand math") {
    import spark.implicits._
    val labeled = Seq(
      ("A", 1L, 100L), ("A", 2L, 300L), ("A", 3L, 50L),
      ("B", 4L, 40L),
      ("C", 5L, 10L), ("C", 6L, 20L))
      .toDF("component", "doc_id", "n_chars")
    val out = Dedup.savingsReport(labeled, "component", "doc_id", "n_chars")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(out(1L) == ((1L, 0L, 0L)))
    assert(out(2L) == ((1L, 1L, 20L))) // keep id 5 (10B), drop 20B
    assert(out(3L) == ((1L, 2L, 350L))) // keep id 1 (100B) of 450B
    assert(out(-1L) == ((3L, 3L, 370L)))
  }

  test("null id/size/component fail loudly") {
    import spark.implicits._
    val bad = Seq((Some("A"), Some(1L), Option.empty[Long]))
      .toDF("component", "doc_id", "n_chars")
    val e = intercept[Exception] {
      Dedup.savingsReport(bad, "component", "doc_id", "n_chars").collect()
    }
    assert(e.getMessage.contains("null n_chars"), e.getMessage)
  }
}
