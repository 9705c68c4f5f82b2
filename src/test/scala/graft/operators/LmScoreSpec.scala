package graft.operators

import graft.SparkSpec

/** Bigram-LM scoring invariants the oracle hash can't express as a
  * property: fluent (corpus-frequent) sequences must score lower
  * negative log-likelihood than rare ones, and the bigram accounting
  * must be positional. */
class LmScoreSpec extends SparkSpec {

  test("frequent bigrams score lower avg_nll than rare ones") {
    import spark.implicits._
    // docs 1-8 repeat one fluent sentence; doc 9 is unique-word soup
    val fluent = (1L to 8L).map(i => (i, "the cat sat on the mat"))
    val soup = Seq((9L, "zq wv xk jp mn bd"))
    val df = (fluent ++ soup).toDF("doc_id", "text")
    val out = LmScore.bigramNll(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(9L),
      s"fluent ${out(1L)} should beat soup ${out(9L)}")
    // identical docs score identically
    assert(out(1L) == out(8L))
  }

  test("bigram accounting: k tokens -> k-1 bigrams; 1-token docs drop out") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "solo")).toDF("doc_id", "text")
    val rows = LmScore.bigramNll(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 3L), rows)
  }
}
