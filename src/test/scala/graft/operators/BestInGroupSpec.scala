package graft.operators

import graft.SparkSpec

/** Dedup.bestInGroup: argmax survivorship with min-id tie-break,
  * singleton groups, loud null contracts. */
class BestInGroupSpec extends SparkSpec {

  private def run(rows: Seq[(String, java.lang.Long, java.lang.Long)]) = {
    import spark.implicits._
    Dedup.bestInGroup(rows.toDF("grp", "id", "score"), "grp", "id", "score")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("keeps the highest score; ties break to the smallest id") {
    val out = run(Seq(
      ("c1", 10L, 5L), ("c1", 11L, 9L), ("c1", 12L, 9L), // tie at 9
      ("c2", 20L, 1L),                                   // singleton
      ("c3", 31L, 7L), ("c3", 30L, 3L)))
    assert(out == Map(
      "c1" -> ((11L, 9L, 3L)),
      "c2" -> ((20L, 1L, 1L)),
      "c3" -> ((31L, 7L, 2L))), out)
  }

  test("min-id survivorship is the degenerate all-equal-scores case") {
    val out = run(Seq(("c", 5L, 1L), ("c", 3L, 1L), ("c", 9L, 1L)))
    assert(out == Map("c" -> ((3L, 1L, 3L))), out)
  }

  test("null group / id / score are loud, not silently losing rows") {
    for (rows <- Seq(
        Seq((null.asInstanceOf[String], java.lang.Long.valueOf(1L),
          java.lang.Long.valueOf(1L))),
        Seq(("c", null.asInstanceOf[java.lang.Long],
          java.lang.Long.valueOf(1L))),
        Seq(("c", java.lang.Long.valueOf(1L),
          null.asInstanceOf[java.lang.Long])))) {
      import spark.implicits._
      val e = intercept[Exception] {
        Dedup.bestInGroup(rows.toDF("grp", "id", "score"),
          "grp", "id", "score").collect()
      }
      assert(e.getMessage.contains("bestInGroup: null"), e.getMessage)
    }
  }
}
