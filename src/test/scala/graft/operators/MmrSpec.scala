package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // Fixture (verified numerically): 1..3 are an a-family of mutual
  // near-copies with rel ~0.9; 4 is DIVERSE (cos to the a's ~0.77)
  // with rel 0.85; 5 is orthogonal. Greedy MMR at lambda 0.5 goes
  // 0, 1, 4, 2 — the diverse 0.85 beats the redundant 0.9 at step 3,
  // which pure relevance ranking never does.
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1f, 0f, 0f, 0f),            // the query row itself
    1L -> Seq(0.9f, 0.4359f, 0f, 0f),
    2L -> Seq(0.9f, 0.4359f, 0.01f, 0f),  // near-copy of 1
    3L -> Seq(0.9f, 0.4359f, 0.02f, 0f),  // near-copy of 1
    4L -> Seq(0.85f, 0f, 0.5268f, 0f),    // diverse, rel 0.85
    5L -> Seq(0f, 0f, 1f, 0f))

  private def run(k: Int, poolSize: Int = 6) =
    Mmr.mmrSelect(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      queryId = 0L, poolSize = poolSize, k = k)
      .collect().map(r => (r.getAs[Long]("step"), r.getAs[Long]("id"),
        r.getAs[Double]("mmr_score")))

  /** Independent greedy MMR in plain double math (rounded like the
    * operator's contract). */
  private def reference(k: Int): Seq[Long] = {
    def cos(a: Seq[Float], b: Seq[Float]): BigDecimal = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      def n(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal.valueOf(d / (n(a) * n(b)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    }
    val m = vecs.toMap
    val q = m(0L)
    val rel = vecs.map { case (id, v) => id -> cos(v, q) }.toMap
    var sel = Vector.empty[Long]
    var rem = vecs.map(_._1).toSet
    for (_ <- 1 to k) {
      val pick =
        if (sel.isEmpty) rem.toSeq.maxBy(id => (rel(id), -id))
        else rem.toSeq.maxBy { id =>
          (rel(id) - BigDecimal("0.5") * sel.map(s => cos(m(id), m(s))).max,
            -id)
        }
      sel :+= pick; rem -= pick
    }
    sel
  }

  test("diversity beats redundancy: step 3 takes the diverse 0.85 over " +
      "the redundant 0.9") {
    val got = run(4)
    assert(got(0)._2 == 0L && math.abs(got(0)._3 - 1.0) < 1e-12)
    assert(got.map(_._2).toSeq == Seq(0L, 1L, 4L, 2L), s"got ${got.toSeq}")
  }

  test("matches an independent greedy MMR on every step") {
    assert(run(6).map(_._2).toSeq == reference(6))
  }

  test("scores are monotone non-increasing only for the diversity-adjusted "
      + "tail and k rows come back") {
    val got = run(4)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.length == 4)
  }

  test("missing query id raises an actionable error") {
    val ex = intercept[IllegalArgumentException] {
      Mmr.mmrSelect(vecs.toDF("vec_id", "embedding"), "vec_id",
        "embedding", queryId = 999L)
    }
    assert(ex.getMessage.contains("999"))
  }
}
