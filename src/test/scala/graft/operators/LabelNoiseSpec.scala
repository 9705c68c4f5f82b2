package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelNoiseSpec extends SparkSpec {
  import spark.implicits._

  // label 0 clusters near e1, label 1 near e2; vec 999 is labeled 0 but
  // sits in label 1's cluster — the planted mislabel
  private def fixture = {
    val rnd = new scala.util.Random(7)
    def v(base: Int, jitter: Float): Array[Float] = {
      val a = Array.fill(8)(jitter * rnd.nextFloat())
      a(base) = 1f; a
    }
    val rows =
      (1L to 20L).map(i => (i, 0, v(0, 0.1f))) ++
      (21L to 40L).map(i => (i, 1, v(1, 0.1f))) :+
      ((999L, 0, v(1, 0.05f)))
    rows.toDF("vec_id", "label", "embedding")
  }

  test("planted mislabel surfaces as its label's rank-1 outlier") {
    val out = LabelNoise.labelOutliers(fixture, "vec_id", "label",
      "embedding", k = 3).collect()
    val r1 = out.find(r => r.getAs[Int]("label") == 0 &&
      r.getAs[Long]("rank") == 1L).get
    assert(r1.getAs[Long]("vec_id") == 999L,
      s"expected 999 as top outlier, got ${r1.getAs[Long]("vec_id")}")
    // k bound per label, ranks ascending in cosine
    val byLabel = out.groupBy(_.getAs[Int]("label"))
    for ((_, rows) <- byLabel) {
      assert(rows.length == 3)
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Double]("cos"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("result is invariant under repartitioning (decimal-exact centroids)") {
    val base = LabelNoise.labelOutliers(fixture, "vec_id", "label",
      "embedding", k = 3).collect().toSeq
    val rep = LabelNoise.labelOutliers(fixture.repartition(7), "vec_id",
      "label", "embedding", k = 3).collect().toSeq
    assert(base.map(_.toString).sorted == rep.map(_.toString).sorted)
  }

  test("two-phase bottom-k equals the single-window reference") {
    val scoredRef = {
      // independent: compute cosines via the centroid components op and
      // a plain per-label sort over collected rows
      val cents = LabelNoise.centroidComponents(fixture, "label", "embedding")
        .collect().groupBy(_.getAs[Int]("label"))
        .view.mapValues(_.sortBy(_.getAs[Int]("pos"))
          .map(_.getAs[Double]("c")).toArray).toMap
      fixture.collect().map { r =>
        val l = r.getAs[Int]("label")
        val v = r.getAs[Seq[Float]]("embedding").toArray
        val c = cents(l)
        val dot = v.zip(c).map { case (a, b) => a.toDouble * b }.sum
        val nv = math.sqrt(v.map(a => a.toDouble * a).sum)
        val nc = math.sqrt(c.map(a => a * a).sum)
        (l, r.getAs[Long]("vec_id"),
          BigDecimal(dot / (nv * nc)).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.groupBy(_._1).view.mapValues(_.sortBy(t => (t._3, t._2)).take(3)
        .map(t => (t._2, t._3)).toSeq).toMap
    }
    val got = LabelNoise.labelOutliers(fixture, "vec_id", "label",
      "embedding", k = 3).collect()
      .groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
        .toSeq).toMap
    assert(got == scoredRef, s"got $got want $scoredRef")
  }
}
