package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cardinality.shingleCardinality vs brute-force set math. */
class CardinalitySpec extends SparkSpec {

  test("exact counts match set math; sketch self-adjudicates") {
    import spark.implicits._
    val df = Seq(
      ("s1", 1L, "a b c d e"),        // shingles: abcd, bcde
      ("s1", 2L, "a b c d e"),        // duplicate doc — no new shingles
      ("s1", 3L, "f g h i"),          // fghi
      ("s2", 4L, "a b c d"),          // abcd (shared with s1, counted per-group)
      ("s2", 5L, "x y"))              // too short — no shingles, no doc count
      .toDF("source", "doc_id", "text")
    val out = Cardinality.shingleCardinality(df, "source", "doc_id", "text",
        n = 4).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // n_docs counts docs contributing >=1 shingle (doc 5 has none)
    assert(out.toSeq == Seq(("s1", 3L, 3L, true), ("s2", 1L, 1L, true)),
      s"got=${out.toSeq}")
  }
}
