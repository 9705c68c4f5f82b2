package graft.operators

import graft.SparkSpec

/** Skyline.frontier2d: hand-built frontier, equal-cost and equal-point
  * tie semantics, group isolation, single-point groups. */
class SkylineSpec extends SparkSpec {

  private def run(rows: Seq[(String, Long, Long, Long)]) = {
    import spark.implicits._
    Skyline.frontier2d(rows.toDF("grp", "id", "cost", "benefit"),
      "grp", "id", "cost", "benefit")
      .collect().map(r => r.getLong(1)).toSet
  }

  test("dominated points drop, the staircase survives") {
    // (cost, benefit): 1->(1,5) 2->(2,9) 3->(3,7) 4->(5,10) 5->(6,1)
    // 3 dominated by 2 (cheaper, better); 5 dominated by 4
    val out = run(Seq(("g", 1L, 1L, 5L), ("g", 2L, 2L, 9L),
      ("g", 3L, 3L, 7L), ("g", 4L, 5L, 10L), ("g", 5L, 6L, 1L)))
    assert(out == Set(1L, 2L, 4L), out)
  }

  test("equal cost: strictly-better benefit wins, exact dups both stay") {
    val out = run(Seq(("g", 1L, 2L, 5L), ("g", 2L, 2L, 8L),
      ("g", 3L, 4L, 8L), ("g", 4L, 4L, 8L)))
    // 1 loses to 2 (same cost, strictly better); 3 and 4 are exact
    // duplicates dominated by the cheaper 2 at equal benefit
    assert(out == Set(2L), out)
    val dup = run(Seq(("g", 1L, 2L, 5L), ("g", 2L, 2L, 5L)))
    assert(dup == Set(1L, 2L), dup)
  }

  test("groups are independent; a lone point is its own frontier") {
    val out = run(Seq(("a", 1L, 9L, 1L), ("b", 2L, 1L, 9L),
      ("c", 3L, 100L, 0L)))
    assert(out == Set(1L, 2L, 3L), out)
  }
}
