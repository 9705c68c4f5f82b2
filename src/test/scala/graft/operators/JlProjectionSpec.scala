package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JlProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Deterministic pseudo-random unit-ish vectors. */
  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(dim)(rnd.nextGaussian().toFloat)
  }

  test("projection components equal hand-computed signed dots") {
    val v = vec(1)
    val out = Seq((1L, v)).toDF("vec_id", "embedding")
    val proj = JlProjection.project(out, "vec_id", "embedding", dim, 4)
      .first().getSeq[Double](1)
    val signs = Dedup.srpSigns(4, dim)
    val want = (0 until 4).map { p =>
      val d = v.indices.foldLeft(0.0)((acc, i) =>
        acc + v(i).toDouble * signs(p)(i))
      BigDecimal.valueOf(d).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(proj == want)
  }

  test("identical and scaled pairs preserve cosine exactly") {
    val v = vec(2)
    val scaled = v.map(_ * 2.0f)
    val df = Seq((0L, v), (1L, v), (2L, v), (3L, scaled))
      .toDF("vec_id", "embedding")
    val out = JlProjection.pairPreservation(df, "vec_id", "embedding",
      dim, 8, bound = 0.75).collect()
      .map(r => r.getLong(0) -> r).toMap
    // pair (0,1): identical vectors — cos 1 on both sides
    assert(out(0L).getDouble(2) == 1.0 && out(0L).getDouble(3) == 1.0)
    assert(out(0L).getDouble(4) == 0.0)
    // pair (2,3): scaling cannot change either cosine
    assert(out(2L).getDouble(2) == 1.0 && out(2L).getDouble(3) == 1.0)
  }

  test("error shrinks with m (deterministic fixture, mean abs error)") {
    val df = (0L until 200L).map(i => (i, vec(i.toInt + 10)))
      .toDF("vec_id", "embedding")
    def meanErr(m: Int): Double = {
      val errs = JlProjection.pairPreservation(df, "vec_id", "embedding",
        dim, m, bound = 2.0).collect().map(_.getDouble(4))
      errs.sum / errs.length
    }
    val e8 = meanErr(8)
    val e64 = meanErr(64)
    assert(e64 < e8, s"m=64 ($e64) should beat m=8 ($e8)")
    assert(e64 < 0.15, s"m=64 mean error too large: $e64")
  }

  test("wrong-dimension vectors are dropped, not silently projected") {
    val df = Seq((0L, vec(5)), (1L, Array.fill(3)(1.0f)))
      .toDF("vec_id", "embedding")
    assert(JlProjection.project(df, "vec_id", "embedding", dim, 4)
      .count() == 1L)
  }
}
