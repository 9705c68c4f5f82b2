package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ZOrder: hand-checked bit interleaving, injectivity on a full grid,
  * the aligned-box locality property the report audits, and the loud
  * out-of-range / null guards. */
class ZOrderSpec extends SparkSpec {

  test("interleave puts bit k of dim i at position k*d + i") {
    import spark.implicits._
    // x=5 (101), y=3 (011), bits=3: z = 1 + 2 + 0 + 8 + 16 + 0 = 27
    val z = ZOrder.zkey(Seq((5L, 3L)).toDF("x", "y"), Seq("x", "y"), 3)
      .collect().head.getAs[Long]("zkey")
    assert(z == 27L, z)
  }

  test("injective on the full 16x16 grid; buckets are aligned 4x4 boxes") {
    import spark.implicits._
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val keyed = ZOrder.zkey(grid, Seq("x", "y"), 4)
    assert(keyed.select("zkey").distinct().count() == 256L)
    val rep = ZOrder.localityReport(grid, Seq("x", "y"), bits = 4,
      shift = 4).collect()
    assert(rep.length == 16)
    rep.foreach { r =>
      assert(r.getAs[Long]("n") == 16L)
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") == 3L)
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") == 3L)
      assert(r.getAs[Long]("x_min") % 4 == 0) // aligned
      assert(r.getAs[Long]("y_min") % 4 == 0)
    }
  }

  test("out-of-range and null dims fail loudly") {
    import spark.implicits._
    val e = intercept[Exception] {
      ZOrder.zkey(Seq((16L, 0L)).toDF("x", "y"), Seq("x", "y"), 4)
        .collect()
    }
    assert(e.getMessage.contains("normalize dims"), e.getMessage)
    val n = intercept[Exception] {
      ZOrder.zkey(Seq((Some(1L), Option.empty[Long])).toDF("x", "y"),
        Seq("x", "y"), 4).collect()
    }
    assert(n.getMessage.contains("normalize dims"), n.getMessage)
  }

  test("parameter contracts") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("x")), 4) // < 2 dims
    }
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("x"), col("y")), 32) // 64 bits > 62
    }
    intercept[IllegalArgumentException] {
      ZOrder.localityReport(df, Seq("x", "y"), 4, shift = 8)
    }
  }
}
