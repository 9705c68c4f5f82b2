package graft.operators

import graft.SparkSpec

/** Agreement.cohenKappa: hand-computed κ, multi-class, negative κ,
  * truncation semantics, null exclusion, degenerate pe=1. */
class AgreementSpec extends SparkSpec {

  private def df(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }
  private def kappaRow(pairs: Seq[(Long, Long)]) =
    Agreement.cohenKappa(df(pairs), "a", "b").collect().head

  test("binary hand example: po .7, pe .5, kappa .4") {
    val pairs = Seq.fill(4)((1L, 1L)) ++ Seq.fill(3)((0L, 0L)) ++
      Seq.fill(2)((1L, 0L)) ++ Seq.fill(1)((0L, 1L))
    val r = kappaRow(pairs)
    assert(r.getLong(0) == 10 && r.getLong(1) == 7 && r.getLong(2) == 3)
    assert(r.getLong(3) == 700000L && r.getLong(4) == 500000L &&
      r.getLong(5) == 400000L, r.toString)
  }

  test("multi-class: 3 classes, kappa .25") {
    val pairs = Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 1L), (1L, 2L), (2L, 0L))
    val r = kappaRow(pairs)
    assert(r.getLong(3) == 500000L && r.getLong(4) == 333333L &&
      r.getLong(5) == 250000L, r.toString)
  }

  test("systematic disagreement: kappa = -1") {
    val r = kappaRow(Seq.fill(3)((1L, 0L)) ++ Seq.fill(3)((0L, 1L)))
    assert(r.getLong(1) == 0 && r.getLong(5) == -1000000L, r.toString)
  }

  test("negative kappa truncates toward zero (DuckDB // parity)") {
    // num = -2, den = 13: -2e6/13 = -153846.15… -> -153846, not -153847
    val pairs = Seq((1L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (0L, 0L))
    assert(kappaRow(pairs).getLong(5) == -153846L)
  }

  test("null ratings are excluded, not a class") {
    import spark.implicits._
    val d = Seq[(Option[Long], Option[Long])](
      (Some(1L), Some(1L)), (Some(0L), Some(0L)),
      (Some(1L), None), (None, Some(0L)), (None, None))
      .toDF("a", "b")
    val r = Agreement.cohenKappa(d, "a", "b").collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2, r.toString)
  }

  test("degenerate input (single shared class): kappa is null") {
    val r = kappaRow(Seq.fill(3)((1L, 1L)))
    assert(r.getLong(3) == 1000000L && r.isNullAt(5), r.toString)
  }

  test("confusionCells: exact cell counts") {
    val cells = Agreement.confusionCells(
      df(Seq((1L, 1L), (1L, 0L), (1L, 0L), (0L, 1L))), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells == Map((1L, 1L) -> 1L, (1L, 0L) -> 2L, (0L, 1L) -> 1L))
  }
}
