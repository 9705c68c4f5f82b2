package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bitext.mineMargin: hand-computed ratio margins, hubness correction,
  * mutual flags, thresholding, negative-cosine exclusion. */
class BitextSpec extends SparkSpec {

  // X: x1=(1,0) x2=(.6,.8) x3=(-1,0); Y: y11=(1,0) y12=(0,1) y13=(.8,.6)
  // k=2 top-k sums (e4): den_x1=18000 (y11,y13), den_x2=17600 (y13,y12),
  // den_y11=16000, den_y12=8000, den_y13=17600 (x3 never makes a top-2).
  private def xs = {
    import spark.implicits._
    Seq((1L, Array(1f, 0f)), (2L, Array(0.6f, 0.8f)), (3L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
  }
  private def ys = {
    import spark.implicits._
    Seq((11L, Array(1f, 0f)), (12L, Array(0f, 1f)), (13L, Array(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
  }

  test("hand-computed margins; margin corrects hubness; mutual flags") {
    val out = Bitext.mineMargin(xs, ys, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))).toMap
    // x1 -> y11: 10000*4e6 div (18000+16000) = 1176470
    assert(out(1L) == ((11L, 1.0, 1176470L, true)), s"${out(1L)}")
    // x2: cos argmax is y13 (0.96) but margin argmax is y12 — the hub
    // y13 sits in a dense neighborhood (den 17600) while y12's is
    // sparse (den 8000): 8000*4e6 div (17600+8000) = 1250000 beats
    // 9600*4e6 div (17600+17600) = 1090909
    assert(out(2L) == ((12L, 0.8, 1250000L, true)), s"${out(2L)}")
    // x3: every cross cosine <= 0 -> no candidate survives c4 > 0
    assert(!out.contains(3L) && out.size == 2)
  }

  test("minMarginMicro filters: only the 1250000 pair survives 1.2") {
    val out = Bitext.mineMargin(xs, ys, "vec_id", "embedding", k = 2,
      minMarginMicro = 1200000L).collect()
    assert(out.length == 1 && out.head.getLong(0) == 2L)
  }

  test("non-mutual pair: target's best elsewhere clears the flag") {
    import spark.implicits._
    // two srcs both point at y11; y11's backward best is x1 (cos 1.0
    // beats 0.9962) -> x4's pair is NOT mutual
    val xs2 = Seq((1L, Array(1f, 0f)), (4L, Array(0.99f, 0.088f)))
      .toDF("vec_id", "embedding")
    val ys2 = Seq((11L, Array(1f, 0f)), (12L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Bitext.mineMargin(xs2, ys2, "vec_id", "embedding", k = 2,
      minMarginMicro = 0L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    assert(out(1L) == ((11L, true)))
    assert(out(4L)._1 == 11L && !out(4L)._2, s"${out(4L)}")
  }

  test("k validation") {
    intercept[IllegalArgumentException] {
      Bitext.mineMargin(xs, ys, "vec_id", "embedding", k = 0)
    }
  }
}
