package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IctSpec extends SparkSpec {
  import spark.implicits._

  test("query + context recombine to the original document exactly") {
    val docs = (0L until 20L)
      .map(i => (i, (0 until 16 + (i % 9).toInt)
        .map(j => s"w${i}_$j").mkString(" ")))
    val out = Ict.pairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      qTokens = 8).collect()
    assert(out.length == docs.length)
    val byId = docs.toMap
    out.foreach { r =>
      val (id, start) = (r.getLong(0), r.getLong(1).toInt)
      val q = r.getString(2).split(" ", -1)
      val c = r.getString(3).split(" ", -1)
      assert(q.length == 8, s"doc $id query length")
      val orig = (c.take(start) ++ q ++ c.drop(start)).mkString(" ")
      assert(orig == byId(id), s"doc $id roundtrip")
      assert(r.getLong(4) == byId(id).split(" ", -1).length)
    }
  }

  test("start offset is the 48-bit md5 hash mod the valid range") {
    val docs = Seq((7L, (0 until 20).map("t" + _).mkString(" ")))
    val start = Ict.pairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      qTokens = 8).first().getLong(1)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("7".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val want = java.lang.Long.parseLong(hex.substring(0, 12), 16) %
      (20 - 8 + 1)
    assert(start == want)
  }

  test("documents too short for a non-empty context are dropped") {
    val docs = Seq(
      (1L, (0 until 15).map("a" + _).mkString(" ")),   // 15 < 2*8
      (2L, (0 until 16).map("b" + _).mkString(" ")))
    val out = Ict.pairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      qTokens = 8).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert(out.head.getString(3).split(" ", -1).length == 8)
  }
}
