package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  /** Sources with exactly n single-space-separated tokens. */
  private def docs(sizes: (String, Int)*) =
    sizes.map { case (s, n) => (s, Seq.fill(n)("w").mkString(" ")) }
      .toDF("source", "text")

  private def run(df: org.apache.spark.sql.DataFrame, budget: Long,
      cap: Int) =
    Unimax.allocate(spark, df, "source", "text", budget, cap)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))).toMap

  test("water-filling: small sources cap, the rest redistributes") {
    // sizes 10/10/80, budget 60, cap 1: shares 20 → both smalls cap at
    // 10; the big source takes the remaining 40 (0.5 epochs)
    val got = run(docs("a" -> 10, "b" -> 10, "big" -> 80), 60L, 1)
    assert(got("a") == ((10L, 1.0, true)))
    assert(got("b") == ((10L, 1.0, true)))
    assert(got("big") == ((40L, 0.5, false)))
  }

  test("nobody caps under a tight budget: uniform integer shares") {
    val got = run(docs("a" -> 50, "b" -> 50, "c" -> 50), 31L, 2)
    // shares 31/3=10, then 21/2=10, then 11/1=11 — floors redistribute
    assert(got("a")._1 == 10L && got("b")._1 == 10L && got("c")._1 == 11L)
    assert(got.values.forall(!_._3))
  }

  test("epoch cap binds globally; leftover strands only past the cap") {
    val got = run(docs("a" -> 10, "b" -> 20), 100L, 2)
    // caps 20/40 both below their shares — everything caps, 40 strands
    assert(got("a") == ((20L, 2.0, true)))
    assert(got("b") == ((40L, 2.0, true)))
  }

  test("ties iterate by name; allocateFraction matches explicit budget") {
    val d = docs("b" -> 30, "a" -> 30, "c" -> 40)
    // total 100, fraction 1/2 → budget 50: a first (share 16), b (17),
    // c (17) — tie order (n, source) makes the floors deterministic
    val frac = Unimax.allocateFraction(spark, d, "source", "text",
      1L, 2L, 3).collect().map(_.toString).sorted.toSeq
    val expl = Unimax.allocate(spark, d, "source", "text", 50L, 3)
      .collect().map(_.toString).sorted.toSeq
    assert(frac == expl)
    val got = run(d, 50L, 3)
    assert(got("a")._1 == 16L && got("b")._1 == 17L && got("c")._1 == 17L)
    assert(got.values.map(_._1).sum == 50L)
  }
}
