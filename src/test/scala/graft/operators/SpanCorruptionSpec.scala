package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  private def off(id: Long, stride: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 12), 16) % stride).toInt
  }

  test("inputs + targets reconstruct the document (lossless denoising)") {
    val docs = (0L until 15L).map(i =>
      (i, (0 until 25 + (i % 30).toInt).map(j => s"w${i}_$j")
        .mkString(" ")))
    val out = SpanCorruption.corrupt(docs.toDF("doc_id", "text"),
      "doc_id", "text", spanLen = 3, stride = 20).collect()
    assert(out.length == docs.length)
    val byId = docs.toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val sentinel = "<extra_id_\\d+>".r
      // parse targets into span-id -> tokens
      val tgt = r.getString(4).split(" ", -1)
      val nSpans = r.getLong(2).toInt
      assert(tgt.last == s"<extra_id_$nSpans>", s"doc $id closing sentinel")
      val spans = scala.collection.mutable.Map[Int, Vector[String]]()
      var cur = -1
      tgt.dropRight(1).foreach { t =>
        if (sentinel.matches(t)) cur = t.stripPrefix("<extra_id_")
          .stripSuffix(">").toInt
        else spans(cur) = spans.getOrElse(cur, Vector()) :+ t
      }
      // splice targets back into inputs
      val rebuilt = r.getString(3).split(" ", -1).flatMap { t =>
        if (sentinel.matches(t))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Vector(t)
      }.mkString(" ")
      assert(rebuilt == byId(id), s"doc $id reconstruction")
    }
  }

  test("span phase follows the md5 offset; rate = spanLen/stride") {
    val id = 3L
    val n = 60
    val docs = Seq((id, (0 until n).map("t" + _).mkString(" ")))
    val r = SpanCorruption.corrupt(docs.toDF("doc_id", "text"),
      "doc_id", "text", spanLen = 3, stride = 20).first()
    val o = off(id, 20)
    val expectSpans = (0 until n).count(p =>
      p >= o && (p - o) % 20 == 0)
    assert(r.getLong(2) == expectSpans)
    val masked = (0 until n).count(p => p >= o && (p - o) % 20 < 3)
    assert(r.getDouble(5) ==
      BigDecimal.valueOf(masked.toDouble / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the first sentinel in inputs sits exactly at the offset
    val inToks = r.getString(3).split(" ", -1)
    assert(inToks(o) == "<extra_id_0>")
  }

  test("sub-stride documents are dropped, boundary-length kept") {
    val docs = Seq((1L, (0 until 19).map("a" + _).mkString(" ")),
      (2L, (0 until 20).map("b" + _).mkString(" ")))
    val out = SpanCorruption.corrupt(docs.toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
  }
}
