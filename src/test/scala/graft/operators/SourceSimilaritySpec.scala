package graft.operators

import graft.SparkSpec

/** SourceSimilarity.centroidSimilarity: hand-computed centroids/cosines,
  * pair shape, group sizes. */
class SourceSimilaritySpec extends SparkSpec {

  test("hand-computed centroid cosines over three groups") {
    import spark.implicits._
    // g1 centroid (1,0); g2 centroid (0,2); g3 centroid (2,2)
    val e = Seq(
      ("g1", Array(1f, 0f)), ("g1", Array(1f, 0f)),
      ("g2", Array(0f, 2f)),
      ("g3", Array(3f, 3f)), ("g3", Array(1f, 1f)))
      .toDF("source", "embedding")
    val out = SourceSimilarity.centroidSimilarity(e, "source", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.size == 3, "C(3,2) unordered pairs, a < b")
    assert(out(("g1", "g2")) == ((2L, 1L, 0.0)))
    assert(out(("g1", "g3")) == ((2L, 2L, 0.7071)))
    assert(out(("g2", "g3")) == ((1L, 2L, 0.7071)))
  }

  test("identical-centroid groups read cosine 1.0") {
    import spark.implicits._
    val e = Seq(("a", Array(2f, 1f)), ("b", Array(4f, 2f)))
      .toDF("source", "embedding")
    val out = SourceSimilarity.centroidSimilarity(e, "source", "embedding")
      .collect().head
    assert(out.getDouble(4) == 1.0)
  }

  test("single group yields no pairs, not an error") {
    import spark.implicits._
    val e = Seq(("only", Array(1f, 2f))).toDF("source", "embedding")
    assert(SourceSimilarity.centroidSimilarity(e, "source", "embedding")
      .collect().isEmpty)
  }
}
