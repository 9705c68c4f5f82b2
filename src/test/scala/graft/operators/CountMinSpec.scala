package graft.operators

import graft.SparkSpec
import graft.expressions.{CountMinSketch, SketchExpressions}
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val terms: Seq[String] =
    Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++ Seq.fill(9)("gamma") ++
      (1 to 30).map(i => s"tail$i")

  private def sketchOf(depth: Int, width: Int, parts: Int): Array[Long] =
    terms.toDF("term").repartition(parts)
      .agg(SketchExpressions.countMinSketch(col("term"), depth, width))
      .first().getSeq[Long](0).toArray

  test("never undercounts, and is exact when no collisions occur") {
    val depth = 4; val width = 4096
    val sk = sketchOf(depth, width, 3)
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((t, f) <- exact) {
      val est = (0 until depth).map(d =>
        sk(d * width + CountMinSketch.bucket(d, t, width))).min
      assert(est >= f, s"$t: est $est < exact $f")
      // 64 distinct terms in 4096 buckets: at least one of the 4 rows is
      // collision-free for every term on this fixture
      assert(est == f, s"$t: est $est != exact $f at width $width")
    }
  }

  test("sketch content is partition-order independent (pointwise-sum merge)") {
    val a = sketchOf(4, 64, 1)
    val b = sketchOf(4, 64, 7)
    assert(a.toSeq == b.toSeq)
    // total mass per row = number of input rows
    for (d <- 0 until 4)
      assert(a.slice(d * 64, (d + 1) * 64).sum == terms.size.toLong)
  }

  test("bucket arithmetic matches the SQL md5 expression") {
    val width = 1024
    val cols = col("term") +: (0 until 4).map(d =>
      (conv(substring(md5(concat(lit(s"$d:"), col("term"))), 1, 8),
        16, 10).cast("long") % width).cast("int").as(s"b$d"))
    val rows = Seq("alpha", "t123", "héllo", "").toDF("term")
      .select(cols: _*).collect()
    for (r <- rows; d <- 0 until 4)
      assert(r.getAs[Int](s"b$d") ==
        CountMinSketch.bucket(d, r.getAs[String]("term"), width),
        s"term ${r.getAs[String]("term")} row $d")
  }

  test("countMinReport verdicts hold and estimates carry the CM bound") {
    val rep = HeavyHitters.countMinReport(terms.toDF("term"), "term",
      depth = 4, width = 1024, topK = 3).collect()
    assert(rep.map(_.getAs[String]("term")).toSeq ==
      Seq("alpha", "beta", "gamma"))
    for (r <- rep) {
      assert(r.getAs[Boolean]("never_under"))
      assert(r.getAs[Boolean]("overcount_ok"))
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n_exact"))
    }
  }
}
