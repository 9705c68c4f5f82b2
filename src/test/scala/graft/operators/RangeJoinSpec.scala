package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binned point-in-interval equals the naive inequality join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = Seq.tabulate(500)(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "x")
    val intervals = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + rnd.nextInt(50).toLong)
    }.toDF("iid", "lo", "hi")
    for (bw <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, Nil,
        "x", "lo", "hi", bw).select("pid", "iid")
      val want = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi")).select("pid", "iid")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"binWidth=$bw")
      assert(got.count() == got.distinct().count(), s"dupes at binWidth=$bw")
    }
  }

  test("binned interval-overlap equals the naive inequality join, no dupes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(120) { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + rnd.nextInt(80).toLong)
    }.toDF("lid", "ls", "le")
    val right = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + rnd.nextInt(40).toLong)
    }.toDF("rid", "rs", "re")
    for (bw <- Seq(1L, 16L, 128L, 2048L)) {
      val got = RangeJoin.intervalOverlap(left, right, Nil,
        "ls", "le", "rs", "re", bw).select("lid", "rid")
      val want = left.join(right,
        col("ls") <= col("re") && col("rs") <= col("le")).select("lid", "rid")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"binWidth=$bw")
      assert(got.count() == got.distinct().count(), s"dupes at binWidth=$bw")
    }
  }

  test("keyed variant only matches within the same key") {
    import spark.implicits._
    val points = Seq(("a", 1L, 5L), ("b", 2L, 5L)).toDF("k", "pid", "x")
    val intervals = Seq(("a", 10L, 0L, 9L)).toDF("k", "iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "x", "lo", "hi", 4).select("pid").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }
}
