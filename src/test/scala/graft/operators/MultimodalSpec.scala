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

  test("image headers: pack→decode round-trips all three container formats") {
    import spark.implicits._
    // dims chosen to exercise byte-order edges: PNG width needs the full
    // big-endian u32 (70000 > u16), GIF/JPEG sit near the u16 ceiling
    // with asymmetric hi/lo bytes (0x1234 vs 0x0101)
    for ((fmt, w, h) <- Seq(("png", 70000, 3), ("png", 1, 1),
        ("jpeg", 0x1234, 257), ("gif", 65535, 2))) {
      val got = Multimodal.decodeImageHeader(
        Multimodal.packImageHeader(fmt, w, h))
      assert(got.contains(Multimodal.ImageHeader(fmt, w, h)), s"$fmt $w x $h")
    }
    // distributed path: spec rows → real bytes → parsed dims, map-side
    val spec = Seq((1L, "png", 640, 480), (2L, "jpeg", 31, 17),
      (3L, "gif", 99, 7)).toDF("id", "fmt", "w", "h")
    val packed = Multimodal.packImages(spark, spec, "id", "fmt", "w", "h").toDF()
    val dec = Multimodal.decodeHeaders(spark, packed).toDF()
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    assert(dec.toSeq == Seq((1L, "png", 640, 480), (2L, "jpeg", 31, 17),
      (3L, "gif", 99, 7)))
    // the packed frame's metadata reflects the REAL bytes
    val m = packed.filter(col("id") === 1).collect().head
    val payload = m.getAs[Array[Byte]]("payload")
    assert(m.getString(1) == "image/png" && m.getLong(2) == payload.length)
    val want = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    assert(m.getString(3) == want)
  }

  test("image headers: PNG chunk CRCs are spec-correct") {
    // IEND's CRC over just its type bytes is the published constant
    // AE 42 60 82 (PNG spec, W3C §5.6) — an independent check that the
    // builder emits real chunk framing, not lookalike bytes
    val png = Multimodal.packImageHeader("png", 2, 2)
    assert(png.takeRight(4).map(b => f"${b & 0xFF}%02X").mkString == "AE426082")
    assert(png.length == 8 + (12 + 13) + 12) // sig + IHDR + IEND
  }

  test("image headers: JPEG marker walk handles fill bytes, SOF2, and SOS-first") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // progressive JPEG (SOF2) with a fill byte before the frame marker
    val sof2 = b(0xFF, 0xD8, 0xFF, 0xFE, 0, 4, 'h', 'i',
      0xFF, 0xFF, 0xC2, 0, 11, 8, 1, 4, 2, 6, 1, 1, 0x11, 0)
    assert(Multimodal.decodeImageHeader(sof2)
      .contains(Multimodal.ImageHeader("jpeg", 0x206, 0x104)))
    // DHT (C4) must be skipped as a table, not read as a frame header
    val dhtFirst = b(0xFF, 0xD8, 0xFF, 0xC4, 0, 3, 0,
      0xFF, 0xC0, 0, 11, 8, 0, 9, 0, 8, 1, 1, 0x11, 0)
    assert(Multimodal.decodeImageHeader(dhtFirst)
      .contains(Multimodal.ImageHeader("jpeg", 8, 9)))
    // scan data before any SOF → unparseable, not a bogus dimension
    val sosFirst = b(0xFF, 0xD8, 0xFF, 0xDA, 0, 2, 1, 2, 3)
    assert(Multimodal.decodeImageHeader(sosFirst).isEmpty)
  }

  test("image headers: truncated / foreign / zero-dim payloads yield None") {
    for (p <- Seq(
        Multimodal.packImageHeader("png", 5, 5).take(6),   // mid-signature
        Multimodal.packImageHeader("jpeg", 5, 5).take(6),  // mid-APP0
        Multimodal.packImageHeader("gif", 5, 5).take(6),   // descriptor cut
        "plain text, not an image".getBytes("UTF-8"),
        Array.emptyByteArray,
        "GIF87a".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0, 0, 0, 0, 0x3B)))
      assert(Multimodal.decodeImageHeader(p).isEmpty, p.mkString(","))
  }

  test("feature extraction reports REAL dims for parseable image payloads") {
    import spark.implicits._
    val spec = Seq((10L, "jpeg", 320, 200)).toDF("id", "fmt", "w", "h")
    val packed = Multimodal.packImages(spark, spec, "id", "fmt", "w", "h").toDF()
    val f = Multimodal.extractFeatures(spark, packed).collect().head
    assert(f.width == 320 && f.height == 200)
  }

  test("feature extraction streams per partition with stable schema") {
    val feats = Multimodal.extractFeatures(spark, packed).toDF()
    assert(feats.columns.toSeq == Seq("id", "width", "height", "features"))
    assert(feats.count() == 3)
    val f1 = feats.filter(col("id") === 1).collect().head
    assert(f1.getSeq[Float](f1.fieldIndex("features")).length == 8)
  }
}
