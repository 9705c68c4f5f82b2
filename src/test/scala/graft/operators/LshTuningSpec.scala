package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LshTuningSpec extends SparkSpec {
  import spark.implicits._

  test("planted twins: permissive banding trades precision for recall") {
    // 5 identical twin pairs (J = 1) + 40 diverse docs; identical docs
    // collide in every band, so every combo reaches recall 1 here
    val twins = (0 until 5).flatMap { i =>
      val text = (0 until 12).map(j => s"t${i}_$j").mkString(" ")
      Seq((i * 2L, text), (i * 2L + 1, text))
    }
    val diverse = (100L until 140L).map(i =>
      (i, (0 until 12).map(j => s"d${i}_$j").mkString(" ")))
    val df = (twins ++ diverse).toDF("doc_id", "text")
    val out = LshTuning.report(spark, df, "doc_id", "text", n = 4,
      threshold = 0.5, numHashes = 32, bandsGrid = Seq(32, 8))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(32L, 8L))
    out.values.foreach { r =>
      assert(r.getLong(2) == 5L, "n_true")
      assert(r.getDouble(6) == 1.0, "recall on identical twins")
      assert(r.getLong(3) >= r.getLong(4), "cand >= found")
    }
    // candidates can only GROW with more (shorter) bands
    assert(out(32L).getLong(3) >= out(8L).getLong(3))
    // s-curve thresholds: more bands = lower collision threshold
    assert(out(32L).getDouble(7) < out(8L).getDouble(7))
  }

  test("no true pairs and no candidates yield null ratios, not crashes") {
    val df = (0L until 10L)
      .map(i => (i, (0 until 10).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    // bands=1 (rows=32): one 32-hash key — diverse docs cannot collide
    val r = LshTuning.report(spark, df, "doc_id", "text", n = 4,
      threshold = 0.5, numHashes = 32, bandsGrid = Seq(1)).first()
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  test("invalid grid entries are refused") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      LshTuning.report(spark, df, "doc_id", "text",
        numHashes = 32, bandsGrid = Seq(5))   // 5 does not divide 32
    }
  }
}
