package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("hashSplit is deterministic, exhaustive, and ~fraction-accurate") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val a = Sampling.hashSplit(df, "id") // 'cd' ~ 205/256 = 0.80
    val b = Sampling.hashSplit(df, "id")
    // deterministic: identical assignment across invocations
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    val trainShare = counts("train").toDouble / 2000
    assert(math.abs(trainShare - 205.0 / 256) < 0.03, s"share=$trainShare")
  }

  test("hashSample keeps a stable subset of the requested fraction") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val s1 = Sampling.hashSample(df, "id", "40") // 64/256 = 0.25
    val s2 = Sampling.hashSample(df, "id", "40")
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val n = s1.count().toDouble
    assert(math.abs(n / 2000 - 0.25) < 0.03, s"kept=$n")
    // subset property: a tighter threshold nests inside a looser one
    val tight = Sampling.hashSample(df, "id", "20")
    assert(tight.exceptAll(s1).isEmpty)
  }

  test("hashSplit adds no shuffle: assignment is pure map-side") {
    import spark.implicits._
    val plan = Sampling.hashSplit((0L until 10L).toDF("id"), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
