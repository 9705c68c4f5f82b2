package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SourceOverlap vs a brute-force per-source shingle-set computation. */
class SourceOverlapSpec extends SparkSpec {

  private def shingleSet(texts: Seq[String], n: Int): Set[String] =
    texts.flatMap(_.split(" ").toList.sliding(n).filter(_.size == n)
      .map(_.mkString("_"))).toSet

  test("overlap matrix equals brute-force set math") {
    import spark.implicits._
    val rows = Seq(
      ("s1", "a b c d e f"),          // shares abcd/bcde with s2
      ("s1", "p q r s t"),
      ("s2", "a b c d e zz"),
      ("s2", "a b c d e f"),          // exact overlap with an s1 doc
      ("s3", "u v w x y z"),          // disjoint from everyone
      ("s4", "p q r s t u"))          // shares pqrs/qrst with s1
    val df = rows.toDF("source", "text")
    val got = SourceOverlap.overlapMatrix(df, "source", "text", n = 4)
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))

    val bySource = rows.groupBy(_._1).view
      .mapValues(ds => shingleSet(ds.map(_._2), 4)).toMap
    val want = bySource.keys.toSeq.sorted.combinations(2).toSeq
      .map { case Seq(a, b) =>
        val (sa, sb) = (bySource(a), bySource(b))
        val shared = (sa & sb).size.toLong
        (a, b, shared, sa.size.toLong, sb.size.toLong,
          shared.toDouble / (sa.size + sb.size - shared))
      }
      .filter(_._3 > 0)
    assert(got.toSeq == want, s"got=${got.toSeq}\nwant=$want")
    // sanity on the fixture itself: a shared pair, and s3 absent entirely
    assert(want.exists { case (a, b, sh, _, _, _) =>
      a == "s1" && b == "s2" && sh >= 2 })
    assert(!got.exists(t => t._1 == "s3" || t._2 == "s3"))
  }
}
