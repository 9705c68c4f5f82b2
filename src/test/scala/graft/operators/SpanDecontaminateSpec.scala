package graft.operators

import graft.SparkSpec

/** Dedup.spanDecontaminate: surgical span removal vs hand computation. */
class SpanDecontaminateSpec extends SparkSpec {

  private val benchText = "q1 q2 q3 q4 q5 q6 q7 q8 tail"

  test("only covered spans are removed; clean docs pass through intact") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b q1 q2 q3 q4 q5 q6 q7 q8 c d"),
      (2L, "totally unrelated text with eight tokens or more here"),
      (3L, "short doc")).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = Dedup.spanDecontaminate(corpus, bench, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out(0) == (1L, "a b c d", 8L, 1L, true), s"${out(0)}")
    assert(out(1) == (2L,
      "totally unrelated text with eight tokens or more here",
      0L, 0L, false))
    // shorter than n: no shingles, never contaminated
    assert(out(2) == (3L, "short doc", 0L, 0L, false))
  }

  test("multiple and fully-covering hits remove everything, doc still returned") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "q1 q2 q3 q4 q5 q6 q7 q8 q1 q2 q3 q4 q5 q6 q7 q8"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val r = Dedup.spanDecontaminate(corpus, bench, "doc_id", "text")
      .collect().head
    assert(r.getString(1) == "" && r.getLong(2) == 16L
      && r.getLong(3) == 2L && r.getBoolean(4))
  }

  test("surgical rewrite keeps every doc the drop rule would discard") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b q1 q2 q3 q4 q5 q6 q7 q8 c d"),
      (2L, "x y z w v u t s r q p o")).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val dropped = Dedup.decontaminate(corpus, bench, "doc_id", "text")
      .count()
    val surgical = Dedup.spanDecontaminate(corpus, bench, "doc_id", "text")
      .count()
    assert(dropped == 1L, "drop rule discards the contaminated doc")
    assert(surgical == 2L, "span rule keeps it, rewritten")
  }
}
