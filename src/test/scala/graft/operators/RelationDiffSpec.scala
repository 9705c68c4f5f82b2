package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RelationDiff.diff/summary: status trichotomy, null-safe per-column
  * comparison, changed_cols order, composite keys, loud contracts. */
class RelationDiffSpec extends SparkSpec {

  private def L = {
    import spark.implicits._
    Seq[(Long, String, java.lang.Long)](
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", null))
      .toDF("k", "s", "v")
  }

  test("added / removed / changed / identical, with changed column list") {
    import spark.implicits._
    val r = Seq[(Long, String, java.lang.Long)](
      (1L, "a", 10L),          // identical
      (2L, "B", 21L),          // changed: s AND v
      (4L, "d", 40L),          // changed: v (null -> 40 IS a change)
      (5L, "e", 50L))          // added; 3L removed
      .toDF("k", "s", "v")
    val out = RelationDiff.diff(L, r, Seq("k")).orderBy("k")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    assert(out.toSeq == Seq(
      (2L, "changed", "s,v"),
      (3L, "removed", ""),
      (4L, "changed", "v"),
      (5L, "added", "")), out.toSeq)
  }

  test("null vs null is NOT a change; dropIdentical=false keeps it") {
    import spark.implicits._
    val r = Seq[(Long, String, java.lang.Long)]((4L, "d", null))
      .toDF("k", "s", "v")
    val l = L.filter(col("k") === 4L)
    assert(RelationDiff.diff(l, r, Seq("k")).count() == 0L)
    val full = RelationDiff.diff(l, r, Seq("k"), dropIdentical = false)
      .collect().map(x => (x.getString(1), x.getString(2)))
    assert(full.toSeq == Seq(("identical", "")), full.toSeq)
  }

  test("composite keys join on both parts") {
    import spark.implicits._
    val l = Seq((1L, "x", 10L), (1L, "y", 20L)).toDF("k1", "k2", "v")
    val r = Seq((1L, "x", 11L), (1L, "y", 20L)).toDF("k1", "k2", "v")
    val out = RelationDiff.diff(l, r, Seq("k1", "k2"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getString(3)))
    assert(out.toSeq == Seq((1L, "x", "changed", "v")), out.toSeq)
  }

  test("summary counts every status") {
    import spark.implicits._
    val r = Seq[(Long, String, java.lang.Long)](
      (1L, "a", 10L), (2L, "x", 20L), (5L, "e", 50L))
      .toDF("k", "s", "v")
    val d = RelationDiff.diff(L, r, Seq("k"), dropIdentical = false)
    val s = RelationDiff.summary(d).collect()(0)
    // 1 identical, 1 changed (k=2), 1 added (k=5), 2 removed (k=3, k=4)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
      == ((1L, 1L, 1L, 2L)), s)
  }

  test("contracts are loud: schema drift, bad keys, null key") {
    import spark.implicits._
    val r2 = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      RelationDiff.diff(L, r2, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      RelationDiff.diff(L, L, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      RelationDiff.diff(L, L, Seq.empty)
    }
    intercept[IllegalArgumentException] { // keys = all columns
      RelationDiff.diff(L, L, Seq("k", "s", "v"))
    }
    val nullKey = Seq[(java.lang.Long, String, java.lang.Long)](
      (null, "a", 10L)).toDF("k", "s", "v")
    val e = intercept[Exception] {
      RelationDiff.diff(nullKey, L, Seq("k")).collect()
    }
    assert(e.getMessage.contains("null key"), e.getMessage)
  }
}
