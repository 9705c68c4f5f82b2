package graft.operators

import graft.{SparkSpec, TestMd5}

/** CaptureRecapture.estimateDistinct: capture membership, overlap, and
  * the Chapman arithmetic all reproduced on the driver over a known key
  * set; duplicate keys collapse before capture counting. */
class CaptureRecaptureSpec extends SparkSpec {

  test("matches driver-side capture math on a known key set") {
    import spark.implicits._
    val keys = (0 until 200).map(i => s"key$i")
    // duplicates must not inflate any count
    val df = (keys ++ keys.take(50)).toDF("k")
    val out = CaptureRecapture.estimateDistinct(df, "k", "8")
      .collect().head
    def captured(salt: String) =
      keys.filter(k => TestMd5.hex(s"${salt}·${k}").substring(0, 1) < "8")
        .toSet
    val (ca, cb) = (captured("a"), captured("b"))
    val na = ca.size.toLong; val nb = cb.size.toLong
    val nab = (ca intersect cb).size.toLong
    assert(out.getAs[Long]("n_a") == na)
    assert(out.getAs[Long]("n_b") == nb)
    assert(out.getAs[Long]("n_ab") == nab)
    assert(out.getAs[Long]("n_hat") == (na + 1) * (nb + 1) / (nab + 1) - 1)
    assert(out.getAs[Long]("exact_distinct") == 200L)
    // half-captures on 200 keys: the estimate should land near truth
    val nHat = out.getAs[Long]("n_hat")
    assert(nHat > 150 && nHat < 260, s"estimate off: $nHat")
  }

  test("contract: threshold is one hex digit") {
    import spark.implicits._
    val df = Seq("x").toDF("k")
    intercept[IllegalArgumentException] {
      CaptureRecapture.estimateDistinct(df, "k", "zz")
    }
    intercept[IllegalArgumentException] {
      CaptureRecapture.estimateDistinct(df, "k", "0")
    }
  }
}
