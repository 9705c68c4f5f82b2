package graft.operators

import graft.SparkSpec

/** ContextFit.report: hand-computed truncation/chunk math, the zero
  * branches, the all-empty-group guard, loud contracts. */
class ContextFitSpec extends SparkSpec {

  private def fit(rows: Seq[(String, Long)], ctxs: Seq[Long]) = {
    import spark.implicits._
    ContextFit.report(rows.toDF("g", "tok"), "g", "tok", ctxs)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))))
      .toMap
  }

  test("hand-computed report at two context lengths") {
    // g: toks 5, 20, 40 — total 65
    val out = fit(Seq(("g", 5L), ("g", 20L), ("g", 40L)), Seq(16L, 32L))
    // ctx 16: over = {20, 40}; truncated = 4 + 24 = 28; retained =
    // 37/65 = 0.569230... -> 569230 micro (truncating); chunks =
    // ceil(5/16)+ceil(20/16)+ceil(40/16) = 1 + 2 + 3 = 6
    assert(out(("g", 16L)) == ((3L, 2L, 65L, 28L, 569230L, 6L)),
      out(("g", 16L)))
    // ctx 32: over = {40}; truncated = 8; retained = 57/65 = 876923
    // micro; chunks = 1 + 1 + 2 = 4
    assert(out(("g", 32L)) == ((3L, 1L, 65L, 8L, 876923L, 4L)),
      out(("g", 32L)))
  }

  test("zero-token docs and an all-empty group") {
    val out = fit(Seq(("a", 0L), ("a", 10L), ("z", 0L)), Seq(8L))
    // a: one doc over (10 > 8), truncated 2, retained 8/10 = 800000,
    // chunks = 0 + 2 (a 0-token doc yields zero chunks)
    assert(out(("a", 8L)) == ((2L, 1L, 10L, 2L, 800000L, 2L)),
      out(("a", 8L)))
    // z: nothing to lose -> retained 1000000 by the div-by-zero guard
    assert(out(("z", 8L)) == ((1L, 0L, 0L, 0L, 1000000L, 0L)),
      out(("z", 8L)))
  }

  test("contracts are loud: bad contexts, null/negative token counts") {
    import spark.implicits._
    val df = Seq(("g", 5L)).toDF("g", "tok")
    intercept[IllegalArgumentException] {
      ContextFit.report(df, "g", "tok", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      ContextFit.report(df, "g", "tok", Seq(0L))
    }
    intercept[IllegalArgumentException] {
      ContextFit.report(df, "g", "tok", Seq(16L, 16L))
    }
    val bad = Seq(("g", java.lang.Long.valueOf(-1L)))
      .toDF("g", "tok")
    val e = intercept[Exception] {
      ContextFit.report(bad, "g", "tok", Seq(16L)).collect()
    }
    assert(e.getMessage.contains("null/negative"), e.getMessage)
    val nul = Seq(("g", null.asInstanceOf[java.lang.Long]))
      .toDF("g", "tok")
    val e2 = intercept[Exception] {
      ContextFit.report(nul, "g", "tok", Seq(16L)).collect()
    }
    assert(e2.getMessage.contains("null/negative"), e2.getMessage)
  }
}
