package graft.operators

import graft.SparkSpec

/** RetrievalEval.groupRelevanceEval: hand-computed MRR/recall/NDCG,
  * exclusions, k truncation. Discounts: w1=1000000, w2=630930,
  * w3=500000 (round(1e6/log2(i+1))). */
class RetrievalEvalSpec extends SparkSpec {

  private def fixtures = {
    import spark.implicits._
    val entities = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"),
      (5L, "B"), (6L, "C")).toDF("id", "grp")
    val runs = Seq(
      // q1: hits at ranks 1 and 3 of A (n_rel = 2)
      (1L, 2L, 1), (1L, 4L, 2), (1L, 3L, 3),
      // q2: single hit at rank 3
      (2L, 5L, 1), (2L, 6L, 2), (2L, 1L, 3),
      // q3: no hits in top-3; the rank-4 hit must be ignored at k=3
      (3L, 4L, 1), (3L, 5L, 2), (3L, 6L, 3), (3L, 1L, 4),
      // q4: hit at rank 1 (n_rel = 1)
      (4L, 5L, 1), (4L, 1L, 2), (4L, 2L, 3),
      // q5: hit at rank 2
      (5L, 2L, 1), (5L, 4L, 2), (5L, 6L, 3),
      // q6: group C is a singleton -> the query is excluded entirely
      (6L, 1L, 1), (6L, 2L, 2), (6L, 3L, 3))
      .toDF("query_id", "doc_id", "rank")
    (entities, runs)
  }

  test("hand-computed group summaries; singleton group excluded") {
    val (entities, runs) = fixtures
    val out = RetrievalEval
      .groupRelevanceEval(entities, "id", "grp", runs, k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // A: rr (1000000+333333+0)/3; recall (1000000+500000+0)/3;
    //    ndcg q1 = 1500000e6 div 1630930 = 919720,
    //         q2 =  500000e6 div 1630930 = 306573 -> mean 408764
    assert(out("A") == ((3L, 444444L, 500000L, 408764L)), s"${out("A")}")
    // B: q4 perfect; q5 rr 500000, ndcg 630930
    assert(out("B") == ((2L, 750000L, 1000000L, 815465L)), s"${out("B")}")
    assert(!out.contains("C") && out.size == 2)
  }

  test("n_rel caps at k: a large group scores against k, not its size") {
    import spark.implicits._
    val entities = ((1L to 5L).map(i => (i, "G")) :+ ((9L, "H")))
      .toDF("id", "grp")
    // q1 retrieves its 2 hits in a k=2 run: recall must be 1.0
    // (denominator min(4, 2) = 2), not 0.5
    val runs = Seq((1L, 2L, 1), (1L, 3L, 2)).toDF("query_id", "doc_id", "rank")
    val out = RetrievalEval
      .groupRelevanceEval(entities, "id", "grp", runs, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("G") == 1000000L, s"$out")
  }

  test("k validation") {
    val (entities, runs) = fixtures
    intercept[IllegalArgumentException] {
      RetrievalEval.groupRelevanceEval(entities, "id", "grp", runs, k = 0)
    }
  }
}
