package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cdc: lossless partition, boundary determinism, shift robustness
  * (the property that motivates content-defined over fixed-size
  * chunking), and the dup report. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def mkText(seed: Int, len: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  private def chunksOf(docs: Seq[(Long, String)], w: Int = 16,
      mask: Int = 63): Map[Long, Seq[(Long, Long, String)]] =
    Cdc.chunkHashes(docs.toDF("doc_id", "text"), "doc_id", "text", w, mask)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  test("chunks partition each text losslessly and cover every char") {
    val docs = Seq(1L -> mkText(7, 400), 2L -> mkText(8, 3),
      3L -> mkText(9, 16))
    val got = chunksOf(docs)
    docs.foreach { case (id, text) =>
      val lens = got(id).map(_._2)
      assert(lens.sum == text.length, s"doc $id: ${lens.sum} != ${text.length}")
      assert(lens.forall(_ >= 1), s"doc $id has an empty chunk")
      // reassembly: hashing the same spans of the original reproduces
      // the chunk hashes in order
      var off = 0
      got(id).foreach { case (_, l, h) =>
        val piece = text.substring(off, off + l.toInt)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(piece.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(md == h, s"doc $id chunk at $off mismatches")
        off += l.toInt
      }
    }
    // short doc (< window): exactly one chunk
    assert(got(2L).size == 1 && got(2L).head._2 == 3)
  }

  test("a 400-char doc at mask 63 actually splits into several chunks") {
    val got = chunksOf(Seq(1L -> mkText(21, 400)))
    assert(got(1L).size >= 3, s"only ${got(1L).size} chunks — boundary " +
      "rule may be broken")
  }

  test("shift robustness: a prefix insertion re-synchronizes chunks") {
    val a = mkText(42, 600)
    val b = "X" + a                       // every byte offset shifts by 1
    val got = chunksOf(Seq(1L -> a, 2L -> b))
    val ha = got(1L).map(_._3).toSet
    val hb = got(2L).map(_._3).toSet
    val shared = ha.intersect(hb).size
    // all chunks after the first boundary match again; only the head
    // chunk differs
    assert(shared >= ha.size - 1 && shared >= 1,
      s"shared $shared of ${ha.size} — chunking did not re-synchronize")
  }

  test("dup report: identical docs all-dup, unique doc none, " +
      "shifted copy mostly-dup") {
    val a = mkText(5, 600)
    val docs = Seq(1L -> a, 2L -> a, 3L -> ("X" + a), 4L -> mkText(6, 600))
    val rep = Cdc.dupChunkReport(docs.toDF("doc_id", "text"),
      "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rep(1L)._1 == rep(1L)._2 && rep(1L)._3 == 1000000L,
      s"identical copy not fully dup: ${rep(1L)}")
    assert(rep(2L)._3 == 1000000L)
    assert(rep(3L)._2 >= rep(3L)._1 - 1 && rep(3L)._2 >= 1,
      s"shifted copy should share all but its head chunk: ${rep(3L)}")
    assert(rep(4L)._2 == 0L && rep(4L)._3 == 0L,
      s"unique doc flagged dup: ${rep(4L)}")
  }

  test("native rolling-hash boundaries == the declarative HOF rule") {
    // the native CdcBoundaries expression is an O(len) rewrite of the
    // O(len·w) HOF; they must agree position-for-position — fuzz over
    // lengths (incl. < w and == w), masks, windows, and BMP non-ASCII
    val rnd = new scala.util.Random(160)
    val texts = (1 to 60).map { i =>
      val len = Seq(0, 5, 15, 16, 17, 40, 200, 900)(i % 8) + rnd.nextInt(9)
      i.toLong -> (0 until len).map(_ =>
        if (rnd.nextInt(20) == 0) 'é' else ('a' + rnd.nextInt(26)).toChar)
        .mkString
    }
    val df = texts.toDF("doc_id", "text").filter(length(col("text")) >= 1)
    for ((w, mask) <- Seq((16, 63), (16, 15), (8, 31), (2, 1))) {
      val got = df.select(col("doc_id"),
        Cdc.boundaryColumn(col("text"), w, mask).as("b")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val want = df.select(col("doc_id"),
        Cdc.boundaryColumnHof(col("text"), w, mask).as("b")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(got == want, s"native != HOF at w=$w mask=$mask")
    }
    // the small-mask fuzz must actually exercise boundaries
    val any = df.select(Cdc.boundaryColumn(col("text"), 2, 1).as("b"))
      .collect().map(_.getSeq[Int](0).size).sum
    assert(any > 0, "fuzz produced zero boundaries — vacuous parity")
  }

  test("cdc ledger step: shifted copy dropped, unique kept, " +
      "evidence-free doc gets the sentinel, history prunes") {
    val a = mkText(7, 600)
    val batch1 = Seq(1L -> a, 2L -> mkText(8, 600), 3L -> "tiny")
      .toDF("doc_id", "text")
    val empty = Cdc.chunkPostings(batch1.limit(0), "doc_id", "text")
    val l1 = Cdc.cdcDedupBatchLedger(batch1, empty, "doc_id", "text")
      .persist()
    val kept1 = l1.groupBy("doc").agg(max(col("kept")).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // distinct contents all kept; the 4-char doc has no >= 32-char
    // chunk, so it carries the band = -1 sentinel and is kept
    assert(kept1 == Map(1L -> true, 2L -> true, 3L -> true))
    assert(l1.filter(col("doc") === 3L && col("band") === -1).count() == 1)
    // batch 2: an exact copy and a SHIFTED copy of doc 1, plus fresh
    // content — both copies share re-synchronized chunks with kept
    // history and are dropped; the doc-hash ledger would miss the
    // shifted one
    val batch2 = Seq(10L -> a, 11L -> ("XY" + a), 12L -> mkText(9, 600))
      .toDF("doc_id", "text")
    val l2 = Cdc.cdcDedupBatchLedger(batch2,
      l1.filter(col("kept") && col("band") >= 0), "doc_id", "text")
    val kept2 = l2.groupBy("doc").agg(max(col("kept")).as("kept"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept2 == Map(10L -> false, 11L -> false, 12L -> true),
      s"got $kept2")
    l1.unpersist()
  }

  test("astral (non-BMP) input fails loudly instead of desyncing the " +
      "oracle hash") {
    // Spark's ascii() returns the first UTF-16 code unit (high
    // surrogate, 0xD83D for this char); a SQL oracle's ascii() returns
    // the code point 0x1F600 — the boundary hash would silently diverge
    val astral = mkText(5, 100) + new String(Character.toChars(0x1F600))
    val docs = Seq(1L -> mkText(5, 100), 2L -> astral).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Cdc.chunkHashes(docs, "doc_id", "text").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("non-BMP"), msg)
    assert(msg.contains("doc 2"), msg)
    // BMP-only non-ASCII stays in contract: é (U+00E9) and 一 (U+4E00)
    // are code-unit == code-point characters, no error
    val bmp = Seq(3L -> (mkText(5, 80) + "é一")).toDF("doc_id", "text")
    assert(Cdc.chunkHashes(bmp, "doc_id", "text").collect().nonEmpty)
  }
}
