package graft.operators

import graft.SparkSpec

/** GoldenRecord.survivorship: majority vote, deterministic tie-break,
  * nulls never vote, all-null cells, conflict counts, validation. */
class GoldenRecordSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    GoldenRecord.survivorship(rows.toDF("cluster", "name", "seg"),
      "cluster", Seq("name", "seg"))
      .collect()
      .map(r => (r.getLong(0), r.getString(2)) ->
        ((r.getLong(1), Option(r.getString(3)), r.getLong(4),
          r.getLong(5))))
      .toMap
  }

  test("majority wins; ties break to the smallest string") {
    val out = run(Seq(
      (1L, "Ann", "auto"), (1L, "Ann", "bike"), (1L, "ANN", "bike"),
      (2L, "Bo", "x"), (2L, "Cy", "x")))
    assert(out((1L, "name")) == ((3L, Some("Ann"), 2L, 2L)), out)
    assert(out((1L, "seg")) == ((3L, Some("bike"), 2L, 2L)), out)
    // 2: Bo vs Cy tie -> "Bo"
    assert(out((2L, "name")) == ((2L, Some("Bo"), 1L, 2L)), out)
    assert(out((2L, "seg")) == ((2L, Some("x"), 2L, 1L)), out)
  }

  test("nulls never vote; all-null fuses to null with support 0") {
    val out = run(Seq(
      (1L, null, null), (1L, null, "s"), (1L, "N", null)))
    assert(out((1L, "name")) == ((3L, Some("N"), 1L, 1L)), out)
    assert(out((1L, "seg")) == ((3L, Some("s"), 1L, 1L)), out)
    val allNull = run(Seq((1L, null, "s"), (1L, null, "s")))
    assert(allNull((1L, "name")) == ((2L, None, 0L, 0L)), allNull)
  }

  test("duplicate attrs are loud") {
    import spark.implicits._
    val df = Seq((1L, "a", "b")).toDF("cluster", "name", "seg")
    intercept[IllegalArgumentException] {
      GoldenRecord.survivorship(df, "cluster", Seq("name", "name"))
    }
  }
}
