package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing invariants (the decode itself is a documented
  * stub — these pin the schema/partitioning/row-shape contracts). */
class MultimodalSpec extends SparkSpec {

  private lazy val packed = {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "abc"), (3L, ""))
      .toDF("doc_id", "text")
    Multimodal.pack(df, "doc_id", "text", "text/plain")
  }

  test("pack: byte counts, sha256, round-trippable payload") {
    val rows = packed.orderBy("id")
      .select(col("id"), col("n_bytes"), decode(col("payload"), "utf-8"))
      .collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(11L, 3L, 0L))
    assert(rows.map(_.getString(2)).toSeq == Seq("hello world", "abc", ""))
    val sha = packed.filter(col("id") === 2).select("sha256")
      .collect().head.getString(0)
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sha == want)
  }

  test("resize truncates payload and rewrites metadata consistently") {
    val r = Multimodal.resize(packed, targetW = 2, targetH = 3) // 6 bytes
    val rows = r.orderBy("id")
      .select(col("n_bytes"), decode(col("payload"), "utf-8"), col("media_type"))
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(6L, 3L, 0L))
    assert(rows.map(_.getString(1)).toSeq == Seq("hello ", "abc", ""))
    assert(rows.forall(_.getString(2) == "text/plain;resized=2x3"))
    // sha256 matches the new payload, not the old one
    val sha = r.filter(col("id") === 1).select("sha256").collect().head.getString(0)
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest("hello ".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sha == want)
  }

  test("sampleFrames: every stride-th byte, ordered, empties drop out") {
    val f = Multimodal.sampleFrames(packed, stride = 4)
    val got = f.orderBy("id", "frame_idx")
      .select(col("id"), col("frame_idx"), decode(col("frame_byte"), "utf-8"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // "hello world": offsets 0,4,8 -> h,o,r ; "abc": offset 0 -> a
    assert(got.toSeq == Seq((1L, 0L, "h"), (1L, 1L, "o"), (1L, 2L, "r"),
      (2L, 0L, "a")))
  }

  test("payloadNearDups: shift-tolerant within a type, never across types") {
    import spark.implicits._
    // ~1.2 KB payload: a 1-byte insertion perturbs only blockBytes of the
    // ~1200 overlapping blocks, so the signature moves a few bits
    // (measured hamming = 5, deterministic — md5 has no seed); an 8-band
    // pigeonhole covers radius <= 7
    val base = ("the quick brown fox jumps over the lazy dog " +
      "and keeps going " ).repeat(20).trim
    val df = Seq(
      (1L, base, "image/png"),
      (2L, "X" + base, "image/png"),   // one byte inserted: blocks shift, most survive
      (3L, base, "audio/wav"),          // identical bytes, different type
      (4L, "completely different payload content with other words entirely", "image/png"))
      .toDF("doc_id", "text", "mt")
    val p = df.select(col("mt")).distinct().collect().map(_.getString(0))
      .map(mt => Multimodal.pack(df.filter(col("mt") === mt), "doc_id", "text", mt))
      .reduce(_ unionByName _)
    val pairs = Multimodal.payloadNearDups(p, radius = 7, bands = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains(("image/png", 1L, 2L)),
      s"shifted payload should stay a near-dup: $pairs")
    assert(!pairs.exists { case (_, a, b) => Set(a, b) == Set(1L, 3L) },
      s"identical payloads in different media types must not pair: $pairs")
    assert(!pairs.exists { case (_, a, b) => b == 4L || a == 4L },
      s"unrelated payload must not pair: $pairs")
  }

  test("payloadNearDups: banded result equals the all-pairs scan; shorts excluded") {
    import spark.implicits._
    val texts = Seq("aaaa bbbb cccc dddd", "aaaa bbbb cccc dddx",
      "zzzz yyyy xxxx wwww", "ab", "aaaa bbbb cccc ddzz")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val p = Multimodal.pack(df, "doc_id", "text", "bin/x")
    val banded = Multimodal.payloadNearDups(p, radius = 3, bands = 4)
      .select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // measured all-pairs hammings (deterministic): (0,1)=2, (0,4)=6,
    // (1,4)=6, rest ~27+ — so radius 3 admits exactly (0,1), and the
    // pigeonhole banding must find exactly that; the 2-byte payload
    // (doc 3) is below blockBytes and must be excluded, not crash
    assert(banded == Set((0L, 1L, 2L)), banded)
  }

  test("byteBlockSimhash64 equals the hex-window simhash64Native form") {
    import spark.implicits._
    import graft.expressions.TextExpressions
    val df = Seq("hello world, a payload long enough to slide over",
        "abc", "abcd", "", "x")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val p = Multimodal.pack(df, "doc_id", "text", "t")
    val hx = hex(col("payload"))
    val blocks = transform(
      sequence(lit(0), (col("n_bytes") - 4).cast("int")),
      i => hx.substr(i * 2 + 1, lit(8)))
    val both = p.filter(col("n_bytes") >= 4)
      .select(col("id"),
        TextExpressions.byteBlockSimhash64(col("payload"), 4).as("a"),
        TextExpressions.simhash64Native(blocks).as("b"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getString(1) == r.getString(2), r))
  }

  test("feature extraction streams per partition with stable schema") {
    val feats = Multimodal.extractFeatures(spark, packed).toDF()
    assert(feats.columns.toSeq == Seq("id", "width", "height", "features"))
    assert(feats.count() == 3)
    val f1 = feats.filter(col("id") === 1).collect().head
    assert(f1.getSeq[Float](f1.fieldIndex("features")).length == 8)
  }
}
