package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MemorizationRiskSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int, minDocs: Long) =
    MemorizationRisk.report(docs.toDF("doc_id", "text"), "doc_id", "text",
      n = n, minDocs = minDocs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("matches a hand-computed fixture, including buckets and max_df") {
    // 2-shingles: docs 1/2/3 share "a_b"; docs 1/2 share "b_c"; doc 4
    // is fully duplicated by doc 5; doc 6 is all-unique; doc 7 is too
    // short to shingle
    val docs = Seq(
      (1L, "a b c x1 y1"),
      (2L, "a b c x2 y2"),
      (3L, "a b z3 x3 y3"),
      (4L, "dup dup2 dup3"),
      (5L, "dup dup2 dup3"),
      (6L, "u1 u2 u3 u4"),
      (7L, "solo"))
    val got = run(docs, 2, 2L)
    assert(got.keySet == (1L to 7L).toSet)
    // doc 1: shingles a_b, b_c, c_x1, x1_y1 → exposed: a_b(df3), b_c(df2)
    assert(got(1L).getAs[Long]("n_shingles") == 4L)
    assert(got(1L).getAs[Long]("n_exposed") == 2L)
    assert(got(1L).getAs[Long]("max_df") == 3L)
    assert(got(1L).getAs[String]("risk") == "high")
    assert(math.abs(got(1L).getAs[Double]("exposed_frac") - 0.5) < 1e-12)
    // doc 3: a_b exposed, rest unique → 1/4 = 0.25 → medium
    assert(got(3L).getAs[String]("risk") == "medium")
    // docs 4/5: every shingle shared → frac 1.0, high
    for (id <- Seq(4L, 5L)) {
      assert(math.abs(got(id).getAs[Double]("exposed_frac") - 1.0) < 1e-12)
      assert(got(id).getAs[String]("risk") == "high")
      assert(got(id).getAs[Long]("max_df") == 2L)
    }
    // doc 6: nothing shared → none (frac 0)
    assert(got(6L).getAs[String]("risk") == "none")
    assert(got(6L).getAs[Long]("n_exposed") == 0L)
    // doc 7: shingleless — present, zeroed, none
    assert(got(7L).getAs[Long]("n_shingles") == 0L)
    assert(got(7L).getAs[Double]("exposed_frac") == 0.0)
    assert(got(7L).getAs[String]("risk") == "none")
  }

  test("minDocs raises the exposure bar") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b z"))
    // minDocs=2: doc 3's a_b (df 3) exposed; minDocs=4: nothing exposed
    assert(run(docs, 2, 2L)(3L).getAs[Long]("n_exposed") == 1L)
    assert(run(docs, 2, 4L).values.forall(_.getAs[Long]("n_exposed") == 0L))
  }
}
