package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Naive-Bayes quality-scorer invariants the oracle hash can't express
  * as a property: token evidence must separate the classes the weak
  * labels describe, scores must be deterministic across runs, and the
  * Laplace smoothing must keep degenerate single-class corpora finite. */
class NbQualitySpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // class-1 docs share a "clean" vocabulary, class-0 docs a "spam" one;
    // doc 9 is an unlabeled-like probe written in class-1 vocabulary but
    // weak-labeled 0 — the classifier should disagree with its label
    val pos = (1L to 4L).map(i => (i, "clear prose with informative words here", 1L))
    val neg = (5L to 8L).map(i => (i, "buy buy click click spam spam now now", 0L))
    val probe = Seq((9L, "clear prose with informative words here", 0L))
    (pos ++ neg ++ probe).toDF("doc_id", "text", "label")
  }

  test("token evidence separates classes; probe doc flips its weak label") {
    val out = NbQuality.naiveBayesScore(fixture, "doc_id", "text", "label")
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L)._1 > 0 && out(1L)._2, s"clean doc should score llr>0: ${out(1L)}")
    assert(out(5L)._1 < 0 && !out(5L)._2, s"spam doc should score llr<0: ${out(5L)}")
    // the probe carries class-1 tokens: evidence outweighs the weak label
    assert(out(9L)._2, s"probe should be predicted kept: ${out(9L)}")
    // identical texts in the same class score identically
    assert(out(1L) == out(2L))
  }

  test("deterministic across runs and repartitionings") {
    val a = NbQuality.naiveBayesScore(fixture, "doc_id", "text", "label")
      .collect().map(_.toSeq).toSet
    val b = NbQuality.naiveBayesScore(fixture.repartition(7), "doc_id", "text", "label")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("single-class corpus stays finite (Laplace priors)") {
    import spark.implicits._
    val df = Seq((1L, "only one class here", 1L), (2L, "more of the same", 1L))
      .toDF("doc_id", "text", "label")
    val rows = NbQuality.naiveBayesScore(df, "doc_id", "text", "label").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val llr = r.getDouble(3)
      assert(!llr.isNaN && !llr.isInfinite, s"llr must be finite: $llr")
    }
  }

  test("n_tokens matches whitespace token count") {
    val counts = NbQuality.naiveBayesScore(fixture, "doc_id", "text", "label")
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) == 6L && counts(5L) == 8L, counts)
  }
}
