package graft.operators

import graft.SparkSpec

/** WeightedQuantiles.perGroup: hand-computed weighted cutoffs, zero
  * weights, the all-zero group, loud contracts. */
class WeightedQuantilesSpec extends SparkSpec {

  private def wq(rows: Seq[(String, Long, Long)], pcts: Seq[Long]) = {
    import spark.implicits._
    WeightedQuantiles.perGroup(rows.toDF("g", "v", "w"), "g", "v", "w",
      pcts)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("hand-computed: the weighted median is where the WEIGHT lives") {
    // g: v=10 (w 1), v=20 (w 3), v=30 (w 6) — total 10; cum 1/4/10
    val rows = Seq(("g", 10L, 1L), ("g", 20L, 3L), ("g", 30L, 6L))
    val out = wq(rows, Seq(100000L, 500000L, 1000000L))
    assert(out(("g", 100000L)) == ((10L, 10L)), out)   // cum 1 >= 1
    assert(out(("g", 500000L)) == ((30L, 10L)), out)   // cum 4 < 5 -> 30
    assert(out(("g", 1000000L)) == ((30L, 10L)), out)
    // the UNWEIGHTED median of {10,20,30} is 20; the weighted is 30
  }

  test("zero-weight values never satisfy a positive quantile alone") {
    val rows = Seq(("g", 5L, 0L), ("g", 10L, 4L))
    val out = wq(rows, Seq(250000L))
    assert(out(("g", 250000L)) == ((10L, 4L)), out)
  }

  test("an all-zero-weight group reports its smallest value") {
    val out = wq(Seq(("z", 7L, 0L), ("z", 3L, 0L)), Seq(500000L))
    assert(out(("z", 500000L)) == ((3L, 0L)), out)
  }

  test("duplicate values merge their weights before the cutoff") {
    // two rows at v=10 (2+3=5 of 10): cum(10)=5 reaches p=0.5 exactly
    val rows = Seq(("g", 10L, 2L), ("g", 10L, 3L), ("g", 20L, 5L))
    val out = wq(rows, Seq(500000L, 500001L))
    assert(out(("g", 500000L)) == ((10L, 10L)), out)
    assert(out(("g", 500001L)) == ((20L, 10L)), out)
  }

  test("contracts are loud: pcts, null value, null/negative weight") {
    import spark.implicits._
    val df = Seq(("g", 1L, 1L)).toDF("g", "v", "w")
    intercept[IllegalArgumentException] {
      WeightedQuantiles.perGroup(df, "g", "v", "w", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      WeightedQuantiles.perGroup(df, "g", "v", "w", Seq(0L))
    }
    intercept[IllegalArgumentException] {
      WeightedQuantiles.perGroup(df, "g", "v", "w", Seq(1000001L))
    }
    intercept[IllegalArgumentException] {
      WeightedQuantiles.perGroup(df, "g", "v", "w", Seq(5L, 5L))
    }
    val negW = Seq(("g", 1L, -1L)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      WeightedQuantiles.perGroup(negW, "g", "v", "w", Seq(500000L))
        .collect()
    }
    assert(e.getMessage.contains("null/negative"), e.getMessage)
    val nullV = Seq(("g", null.asInstanceOf[java.lang.Long],
      java.lang.Long.valueOf(1L))).toDF("g", "v", "w")
    val e2 = intercept[Exception] {
      WeightedQuantiles.perGroup(nullV, "g", "v", "w", Seq(500000L))
        .collect()
    }
    assert(e2.getMessage.contains("null"), e2.getMessage)
  }
}
