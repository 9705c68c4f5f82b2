package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditDistJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook Levenshtein. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def reference(keys: Seq[String], maxDist: Int)
      : Map[(String, String), Long] =
    (for {
      a <- keys.distinct; b <- keys.distinct if a < b
      d = lev(a, b) if d <= maxDist
    } yield (a, b) -> d.toLong).toMap

  private def run(keys: Seq[String], maxDist: Int)
      : Map[(String, String), Long] =
    EditDistJoin.selfJoin(keys.toDF("key"), "key", maxDist)
      .collect()
      .map(r => (r.getAs[String]("key_a"), r.getAs[String]("key_b")) ->
        r.getAs[Long]("dist")).toMap

  private val keys = Seq(
    "spark", "spark",          // duplicate input rows collapse
    "sparc",                   // sub (d1 from spark)
    "spar",                    // del (d1)
    "sparks",                  // ins (d1)
    "spam",                    // d2 from spark
    "scala",                   // d4 from spark: out
    "", "a", "ab", "abc",      // short/empty chains
    "xyzzy")

  test("matches brute-force Levenshtein at maxDist 2 (subs/ins/dels)") {
    val got = run(keys, 2)
    val want = reference(keys, 2)
    assert(got == want, s"got ${got.toSeq.sorted} want ${want.toSeq.sorted}")
    // the fixture actually exercises all three edit kinds + the empty key
    assert(want.contains(("sparc", "spark")) &&
      want.contains(("spar", "spark")) &&
      want.contains(("spark", "sparks")) &&
      want.contains(("", "ab")))
    assert(!want.contains(("scala", "spark")))
  }

  test("matches brute-force at maxDist 1") {
    assert(run(keys, 1) == reference(keys, 1))
  }

  test("null keys are ignored, distance 3 pairs excluded") {
    val withNull = Seq(Some("abc"), None, Some("abcdef")).toDF("key")
    val got = EditDistJoin.selfJoin(withNull, "key", 2).collect()
    assert(got.isEmpty)   // lev(abc, abcdef) = 3
  }
}
