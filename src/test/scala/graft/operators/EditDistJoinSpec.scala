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

  private def runHybrid(keys: Seq[String], maxDist: Int, maxKeyLen: Int)
      : Map[(String, String), Long] =
    EditDistJoin.selfJoinHybrid(keys.toDF("key"), "key", maxDist,
      maxKeyLen)
      .collect()
      .map(r => (r.getAs[String]("key_a"), r.getAs[String]("key_b")) ->
        r.getAs[Long]("dist")).toMap

  test("hybrid == brute force on textbook long-key fixtures") {
    val base = "the quick brown fox jumps over the lazy dog near the" +
      " riverbank at dawn"                              // 73 chars
    val longKeys = Seq(
      base,
      base.updated(10, 'X').toString,                   // 1 sub
      base.patch(25, "", 1),                            // 1 del
      base.patch(40, "Z", 0),                           // 1 ins
      base.updated(5, 'Q').updated(60, 'W').toString,   // 2 subs
      base.patch(3, "", 1).updated(50, 'Y').toString,   // del + sub
      base.reverse,                                     // far away
      "completely unrelated text of a broadly similar total length!!")
    for (d <- Seq(1, 2)) {
      val got = runHybrid(longKeys, d, maxKeyLen = 16)
      val want = reference(longKeys, d)
      assert(got == want,
        s"d=$d got ${got.keys.toSeq.sorted} want ${want.keys.toSeq.sorted}")
    }
    // the fixture really exercises the segment path: every key is far
    // beyond maxKeyLen, and the planted 1/2-edit pairs are found
    assert(reference(longKeys, 2).size >= 6)
  }

  test("hybrid catches pairs straddling the short/long boundary") {
    // maxKeyLen = 10: "abcdefghij" (10) is short-block, "abcdefghijk"
    // (11) is long-block; their distance-1 pair must still be found via
    // the overlapping segment block
    val keys = Seq("abcdefghij", "abcdefghijk", "abcdefghz")
    val got = runHybrid(keys, 2, maxKeyLen = 10)
    assert(got == reference(keys, 2), got)
    assert(got.contains(("abcdefghij", "abcdefghijk")))
  }

  test("fuzz: hybrid == brute force on a high-collision alphabet") {
    val rnd = new scala.util.Random(47)
    // lengths 4..40 over {a,b,c}: heavy segment collisions, mixed
    // blocks, plus mutated twins so true pairs exist at both distances
    val raw = (1 to 90).map { _ =>
      val len = 4 + rnd.nextInt(37)
      (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val twins = raw.take(30).map { s =>
      val ops = 1 + rnd.nextInt(2)
      (0 until ops).foldLeft(s) { (t, _) =>
        if (t.isEmpty) t
        else rnd.nextInt(3) match {
          case 0 => t.updated(rnd.nextInt(t.length),
            ('a' + rnd.nextInt(3)).toChar).toString
          case 1 => t.patch(rnd.nextInt(t.length), "", 1)
          case _ => t.patch(rnd.nextInt(t.length + 1),
            ('a' + rnd.nextInt(3)).toChar.toString, 0)
        }
      }
    }
    val keys = raw ++ twins
    for (d <- Seq(1, 2)) {
      val got = runHybrid(keys, d, maxKeyLen = 12)
      val want = reference(keys, d)
      assert(got == want, {
        val miss = want.keySet -- got.keySet
        val extra = got.keySet -- want.keySet
        s"d=$d missing=$miss extra=$extra"
      })
    }
  }

  test("hybrid == selfJoin when every key fits the short block") {
    assert(runHybrid(keys, 2, maxKeyLen = 32) == reference(keys, 2))
  }
}
