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

  test("fractional score column fails loudly at declare time") {
    // the r12 contract was doc-only: cast("long") silently truncated a
    // double score, manufacturing ties the caller never asked for
    val df = Seq(("a", 1L, 1.5), ("a", 2L, 1.4)).toDF("src", "id", "score")
    val e = intercept[IllegalArgumentException] {
      QuantileNorm.perGroup(df, "src", "id", "score")
    }
    assert(e.getMessage.contains("must be integral"), e.getMessage)
    assert(e.getMessage.contains("quantize"), e.getMessage)
  }

  test("null scores are excluded, not null-ranked") {
    val df = Seq(("a", 1L, Some(2L)), ("a", 2L, None), ("a", 3L, Some(1L)))
      .toDF("src", "id", "score")
    val got = QuantileNorm.perGroup(df, "src", "id", "score")
      .select("id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 1L -> 2L)) // id 2 (null score) dropped
  }

  test("degenerate tie class fails loudly past maxTieClass") {
    // one modal score per group (clipped/saturated scorer) makes the
    // tie window's partition the WHOLE group — the funnel the histogram
    // decomposition exists to avoid; the guard must name the class
    val df = (1 to 64).map(i => ("sat", i.toLong, 7L))
      .toDF("src", "id", "score")
    val e = intercept[Exception] {
      QuantileNorm.perGroup(df, "src", "id", "score", maxTieClass = 32L)
        .collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("tie class"), msg)
    assert(msg.contains("maxTieClass 32"), msg)
    // at the bound itself (64 rows, bound 64) the guard stays silent
    val ok = QuantileNorm.perGroup(df, "src", "id", "score",
      maxTieClass = 64L).collect()
    assert(ok.length == 64)
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
