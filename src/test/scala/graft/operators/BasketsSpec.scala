package graft.operators

import graft.SparkSpec

/** Baskets.frequentPairs: hand-computed support/confidence/lift, the
  * Apriori item prune, the support filter, within-basket dup collapse,
  * and the loud basket-size guard. */
class BasketsSpec extends SparkSpec {

  // b1 {A,B,C}, b2 {A,B}, b3 {A,C}, b4 {A,D} — A x4, B x2, C x2, D x1
  private val rows = Seq(1L -> "A", 1L -> "B", 1L -> "C", 1L -> "A",
    2L -> "A", 2L -> "B", 3L -> "A", 3L -> "C", 4L -> "A", 4L -> "D")

  private def run(minSupportMicro: Long = 10000,
      maxBasketSize: Int = 64) = {
    import spark.implicits._
    Baskets.frequentPairs(rows.toDF("bk", "it"), "bk", "it",
      minSupportMicro = minSupportMicro, maxBasketSize = maxBasketSize)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
  }

  test("hand-computed pairs; D pruned by minItemCount; dups collapse") {
    val out = run()
    // (A,B): c12=2 of nb=4; conf A->B 2/4, B->A 2/2; lift (2*4)/(4*2)=1
    assert(out(("A", "B")) ==
      ((4L, 2L, 2L, 500000L, 500000L, 1000000L, 1000000L)), out)
    assert(out(("A", "C")) ==
      ((4L, 2L, 2L, 500000L, 500000L, 1000000L, 1000000L)), out)
    // (B,C): c12=1; lift (1*4)/(2*2)=1 via the staged truncation
    assert(out(("B", "C")) ==
      ((2L, 2L, 1L, 250000L, 500000L, 500000L, 1000000L)), out)
    // D appears in one basket < minItemCount=2: no (A,D) pair
    assert(out.size == 3, out)
  }

  test("support filter drops the rare pair") {
    val out = run(minSupportMicro = 300000)
    assert(out.keySet == Set(("A", "B"), ("A", "C")), out)
  }

  test("oversized basket is loud") {
    val e = intercept[IllegalArgumentException] { run(maxBasketSize = 2) }
    assert(e.getMessage.contains("maxBasketSize"), e.getMessage)
  }
}
