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

  test("Kneser-Ney: hand-computed rationals on a 2-doc corpus") {
    import spark.implicits._
    // corpus: doc1 "a b a c", doc2 "a b b"
    //   types: (a,b):2 (b,a):1 (a,c):1 (b,b):1; T = 4
    //   ctx a: c1=3 n1p=2; ctx b: c1=2 n1p=2
    //   ends: a:1 b:2 c:1
    //   P(a,b) = ((8-3)·4 + 3·2·2)/(4·3·4) = 32/48   → ln = -0.405465
    //   P(b,a) = (4 + 3·2·1)/(4·2·4)      = 10/32   → ln = -1.163151
    //   P(a,c) = (4 + 3·2·1)/(4·3·4)      = 10/48   → ln = -1.568616
    //   P(b,b) = (4 + 3·2·2)/(4·2·4)      = 16/32   → ln = -0.693147
    //   doc1 avg_nll = (0.405465+1.163151+1.568616)/3 = 1.045744
    //   doc2 avg_nll = (0.405465+0.693147)/2          = 0.549306
    val df = Seq((1L, "a b a c"), (2L, "a b b")).toDF("doc_id", "text")
    val out = LmScore.kneserNeyNll(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out == Map(1L -> ((3L, 1.0457)), 2L -> ((2L, 0.5493))), out)
  }

  test("Kneser-Ney rewards continuation diversity over raw frequency") {
    import spark.implicits._
    // "nine" and "francisco" both occur 9 times in the background, but
    // nine follows 9 DISTINCT contexts while francisco only ever
    // follows "san" (the paper's motivating example). The probes share
    // the context "the" with c2 = 1, so ONLY the continuation term
    // differs: nend(nine) = 10 vs nend(francisco) = 2, T = 12,
    // ctx(the) = (c1 2, n1p 2):
    //   P(the nine)      = (12 + 3·2·10)/96 = 72/96 → nll 0.2877
    //   P(the francisco) = (12 + 3·2·2)/96  = 24/96 → nll 1.3863
    val ctxDocs = (1L to 9L).map(i => (i, s"w$i nine"))
    val sfDocs = (10L to 18L).map(i => (i, "san francisco"))
    val probes = Seq((19L, "the nine"), (20L, "the francisco"))
    val df = (ctxDocs ++ sfDocs ++ probes).toDF("doc_id", "text")
    val out = LmScore.kneserNeyNll(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(19L) == 0.2877 && out(20L) == 1.3863, out)
  }
}
