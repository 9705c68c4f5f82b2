package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Profiler.profile: hand-computed counts/min-max/mode, null handling,
  * tie-breaks, the all-null column, and validation. */
class ProfilerSpec extends SparkSpec {

  private def run(rows: Seq[(java.lang.Long, String)]) = {
    import spark.implicits._
    Profiler.profile(rows.toDF("k", "s"),
      Seq("k" -> col("k"), "s" -> col("s")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5), r.getLong(6),
        r.getString(7), r.getLong(8))))
      .toMap
  }

  test("counts, native min/max, avg length, mode") {
    val out = run(Seq((10L, "bb"), (9L, "bb"), (10L, "a"), (null, "a"),
      (10L, null)))
    // k: 4 non-null, native min 9 < 10 (string order would say "10")
    assert(out("k") == ((5L, 1L, 2L, "9", "10", 1750000L, "10", 3L)), out)
    // s: "a" x2 vs "bb" x2 tie -> smallest string; avg len (1+1+2+2)/4
    assert(out("s") == ((5L, 1L, 2L, "a", "bb", 1500000L, "a", 2L)), out)
  }

  test("all-null column: null min/max/mode, zero lengths") {
    import spark.implicits._
    val out = Profiler.profile(
      Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s"),
      Seq("s" -> col("s"))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(7))
    assert(r.getLong(6) == 0L && r.getLong(8) == 0L)
  }

  test("expression columns profile the rendered expression") {
    import spark.implicits._
    val out = Profiler.profile(Seq(1.25, 2.5).toDF("x"),
      Seq("cents" -> round(col("x") * 100).cast("long"))).collect().head
    assert(out.getString(4) == "125" && out.getString(5) == "250")
  }

  test("duplicate profile names are loud") {
    import spark.implicits._
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      Profiler.profile(df, Seq("k" -> col("k"), "k" -> col("k")))
    }
  }

  test("drift: stable columns pass, each drift axis trips its flag") {
    import spark.implicits._
    def prof(rows: Seq[(Option[String], String, String)]) =
      Profiler.profile(rows.toDF("nullable", "lowcard", "grows"), Seq(
        "nullable" -> col("nullable"), "lowcard" -> col("lowcard"),
        "grows" -> col("grows")))
    // side A: no nulls, mode "x", 4 distinct values in `grows`
    val a = prof(Seq(
      (Some("v"), "x", "a1"), (Some("v"), "x", "a2"),
      (Some("v"), "x", "a3"), (Some("v"), "y", "a4")))
    // side B: 50% nulls (null drift), mode flips to "y" (mode drift),
    // `grows` collapses to 1 distinct (cardinality drift)
    val b = prof(Seq(
      (None, "y", "b1"), (Some("v"), "y", "b1"),
      (None, "x", "b1"), (Some("v"), "y", "b1")))
    val out = Profiler.drift(a, b).collect()
      .map(r => r.getString(0) -> r).toMap
    val nullable = out("nullable")
    assert(nullable.getAs[Long]("null_rate_b_micro") == 500000L &&
      nullable.getAs[Long]("null_drift_micro") == 500000L &&
      nullable.getAs[Boolean]("drifted"), nullable)
    val lowcard = out("lowcard")
    assert(lowcard.getAs[Boolean]("mode_changed") &&
      lowcard.getAs[Boolean]("drifted"), lowcard)
    val grows = out("grows")
    assert(grows.getAs[Long]("distinct_drift_micro") == 750000L &&
      grows.getAs[Boolean]("drifted"), grows)
    // identical profiles: nothing drifts
    val same = Profiler.drift(a, a).collect()
    assert(same.forall(!_.getAs[Boolean]("drifted")), same.toSeq)
  }

  test("drift: a column missing from one side is a loud contract break") {
    import spark.implicits._
    val a = Profiler.profile(Seq(("v", 1L)).toDF("s", "k"),
      Seq("s" -> col("s"), "k" -> col("k")))
    val b = Profiler.profile(Seq(("v", 1L)).toDF("s", "k"),
      Seq("s" -> col("s")))
    val out = Profiler.drift(a, b).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("drifted")).toMap
    assert(out == Map("s" -> false, "k" -> true), out)
  }
}
