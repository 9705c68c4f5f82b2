package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** QuantileNorm: the histogram decomposition must equal the plain
  * per-group window rank exactly — ties by id, groups isolated, micro
  * quantiles strictly inside (0,1). */
class QuantileNormSpec extends SparkSpec {
  import spark.implicits._

  test("histogram rank == global window rank, ties by id, exact micro") {
    val rows = Seq(
      ("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("a", 5L, 10L),
      ("b", 6L, 5L), ("b", 7L, 5L), ("b", 8L, 5L),   // all-tie group
      ("c", 9L, 42L))                                 // singleton group
    val got = QuantileNorm.perGroup(rows.toDF("src", "id", "score"),
      "src", "id", "score")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    val want = rows.groupBy(_._1).values.flatMap { g =>
      val n = g.size
      g.sortBy(r => (r._3, r._2)).zipWithIndex.map { case (r, i) =>
        r._2 -> (((i + 1).toLong, (i + 1).toLong * 1000000L / (n + 1)))
      }
    }.toMap
    assert(got == want, s"got $got want $want")
    // ties resolved by id: ids 2,5 share score 10 → ranks 1,2 by id
    assert(got(2L)._1 == 1L && got(5L)._1 == 2L)
    // all-tie group is still a clean 1..n by id
    assert(Seq(6L, 7L, 8L).map(got(_)._1) == Seq(1L, 2L, 3L))
    // quantiles strictly inside (0,1): rank n maps to n/(n+1)
    assert(got.values.forall(v => v._2 > 0L && v._2 < 1000000L))
    // singleton group: rank 1 of n=1 → 500000
    assert(got(9L) == ((1L, 500000L)))
  }

  test("fuzz: decomposition == window rank on random data") {
    val rnd = new scala.util.Random(93)
    val rows = (1 to 500).map(i =>
      (s"g${rnd.nextInt(4)}", i.toLong, rnd.nextInt(12).toLong))
    val df = rows.toDF("src", "id", "score")
    val got = QuantileNorm.perGroup(df, "src", "id", "score")
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("score"), col("id"))
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
