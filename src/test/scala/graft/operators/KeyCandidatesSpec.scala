package graft.operators

import graft.SparkSpec

/** KeyCandidates.audit: the key / dup / nullable-near-miss trichotomy,
  * composite keys, null tuple exclusion, validation. */
class KeyCandidatesSpec extends SparkSpec {

  private def run(rows: Seq[(java.lang.Long, java.lang.Long, String)],
      cands: Seq[Seq[String]]) = {
    import spark.implicits._
    KeyCandidates.audit(rows.toDF("a", "b", "s"), cands)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
  }

  test("key vs dup vs unique-but-nullable near-miss") {
    val rows: Seq[(java.lang.Long, java.lang.Long, String)] = Seq(
      (1L, 1L, "x"), (1L, 2L, "y"), (2L, 1L, "y"), (2L, null, "z"))
    val out = run(rows, Seq(Seq("a"), Seq("s"), Seq("a", "b"), Seq("b")))
    // a: no nulls but dup -> not a key
    assert(out("a") == ((4L, 4L, 2L, 2L, false)), out)
    // s: "y" twice
    assert(out("s") == ((4L, 4L, 3L, 2L, false)), out)
    // a+b: the null-b row drops; 3 distinct non-null tuples, max_dup 1
    // but n_nonnull < n_rows -> unique-but-nullable, NOT a key
    assert(out("a+b") == ((4L, 3L, 3L, 1L, false)), out)
    assert(out("b") == ((4L, 3L, 2L, 2L, false)), out)
  }

  test("a true composite key passes") {
    val rows: Seq[(java.lang.Long, java.lang.Long, String)] = Seq(
      (1L, 1L, "x"), (1L, 2L, "x"), (2L, 1L, "x"))
    val out = run(rows, Seq(Seq("a", "b"), Seq("a")))
    assert(out("a+b") == ((3L, 3L, 3L, 1L, true)), out)
    assert(!out("a")._5, out)
  }

  test("duplicate or empty candidates are loud") {
    import spark.implicits._
    val df = Seq((1L, 1L, "x")).toDF("a", "b", "s")
    intercept[IllegalArgumentException] {
      KeyCandidates.audit(df, Seq(Seq("a"), Seq("a")))
    }
    intercept[IllegalArgumentException] {
      KeyCandidates.audit(df, Seq(Seq.empty))
    }
  }
}
