package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("boundedRank matches (score desc, id asc) dense ranking") {
    val df = Seq((10L, 0.5), (20L, 0.9), (30L, 0.5), (40L, 0.1))
      .toDF("id", "score")
    val got = Rrf.boundedRank(df, "id", "score").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rank")).toMap
    // 20 (0.9) → 1; tie at 0.5 broken by id: 10 → 2, 30 → 3; 40 → 4
    assert(got == Map(20L -> 1L, 10L -> 2L, 30L -> 3L, 40L -> 4L))
  }

  test("fuse: ids in both lists outrank single-list ids; exact decimals") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((2L, 1L), (4L, 2L)).toDF("id", "rank")
    val got = Rrf.fuse(Seq(a, b), "id", k = 60, topN = 10).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_lists"),
        r.getAs[Double]("rrf_score")))
    val byId = got.map(g => g._1 -> g).toMap
    def c(rank: Int): BigDecimal =
      BigDecimal.valueOf(1.0 / (60 + rank))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    // id 2: ranks 2 and 1 → the top fused id despite rank-1 in only one
    assert(got.head._1 == 2L && got.head._2 == 2L)
    assert(math.abs(byId(2L)._3 - (c(2) + c(1)).toDouble) < 1e-12)
    assert(math.abs(byId(1L)._3 - c(1).toDouble) < 1e-12)
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("fuse: topN truncates by (score desc, id asc)") {
    val a = (1L to 5L).map(i => (i, i)).toDF("id", "rank")
    val got = Rrf.fuse(Seq(a), "id", k = 60, topN = 2).collect()
    assert(got.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
  }

  test("rrf prefers consistently-mid over once-top (the calibration-free " +
      "property)") {
    // id 9 is rank 1 in one list only; id 5 is rank 2 in all three
    val lists = (0 until 3).map { i =>
      (if (i == 0) Seq((9L, 1L), (5L, 2L), (6L, 3L))
       else Seq((6L + i, 1L), (5L, 2L), (9L, 40L))).toDF("id", "rank")
    }
    val top = Rrf.fuse(lists, "id", k = 60, topN = 1).collect()
    assert(top.head.getAs[Long]("id") == 5L)
  }
}
