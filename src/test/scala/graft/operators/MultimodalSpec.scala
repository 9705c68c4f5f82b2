package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal invariants: REAL javax.imageio pixel round-trips (encode →
  * decode → exact luminance histograms), real resize and animated-GIF
  * frame sampling, plus the schema/partitioning/row-shape contracts. */
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

  test("pixel round-trip: encoded fixtures decode to exact luminance histograms") {
    // png two-band is lossless; gif palettes the constant exactly; jpeg's
    // bin-center constant may drift ±2 in value but never crosses a bin
    val png = Multimodal.renderGrayBands("png", 37, 23, 200, 40)
    val hPng = Multimodal.luminanceHistogram(Multimodal.decodeImage(png).get)
    // top band: 11 rows at 200 (bin 6); bottom: 12 rows at 40 (bin 1)
    assert(hPng.toSeq == Seq(0L, 12L * 37, 0L, 0L, 0L, 0L, 11L * 37, 0L))
    for ((fmt, g) <- Seq(("jpeg", 16 + 3 * 32), ("gif", 147))) {
      val bytes = Multimodal.renderGrayBands(fmt, 21, 9, g, g)
      val img = Multimodal.decodeImage(bytes).get
      assert(img.getWidth == 21 && img.getHeight == 9)
      val h = Multimodal.luminanceHistogram(img)
      assert(h(g / 32) == 21L * 9, s"$fmt: ${h.toSeq}")
    }
  }

  test("resizeImages: real rescale preserves band bins; undecodable passes through") {
    import spark.implicits._
    val spec = Seq((1L, "png", 40, 30, 200, 40), (2L, "jpeg", 33, 17, 112, 112),
      (3L, "gif", 9, 8, 77, 77)).toDF("id", "fmt", "w", "h", "gt", "gb")
    val imgs = Multimodal.packPixelImages(spark, spec,
      "id", "fmt", "w", "h", "gt", "gb").toDF()
    val withText = imgs.unionByName(
      Multimodal.pack(Seq((9L, "not an image")).toDF("doc_id", "text"),
        "doc_id", "text", "text/plain"))
    val r = Multimodal.resizeImages(spark, withText, 24, 16)
    val rows = r.collect().map(x => x.id -> x).toMap
    for (id <- Seq(1L, 2L, 3L)) {
      assert(rows(id).resized, s"id=$id should resize")
      assert(rows(id).media_type.endsWith(";resized=24x16"))
      val img = Multimodal.decodeImage(rows(id).payload).get
      assert(img.getWidth == 24 && img.getHeight == 16)
      // sha/n_bytes describe the NEW payload
      val want = java.security.MessageDigest.getInstance("SHA-256")
        .digest(rows(id).payload).map("%02x".format(_)).mkString
      assert(rows(id).sha256 == want && rows(id).n_bytes == rows(id).payload.length)
    }
    // nearest-neighbor introduces no new colors: all 384 pixels stay in
    // the source bands' bins
    val h1 = Multimodal.luminanceHistogram(
      Multimodal.decodeImage(rows(1L).payload).get)
    assert(h1(6) + h1(1) == 24L * 16 && h1(6) > 0 && h1(1) > 0, h1.toSeq)
    // undecodable: untouched payload, no resized tag, flag false
    assert(!rows(9L).resized && rows(9L).media_type == "text/plain")
    assert(new String(rows(9L).payload, "UTF-8") == "not an image")
  }

  test("sampleFrames: real animated GIFs, every stride-th decoded frame") {
    import spark.implicits._
    val spec = Seq((1L, 16, 12, 5, 10, 37), (2L, 8, 8, 1, 200, 0))
      .toDF("id", "w", "h", "nf", "gb", "gs")
    val gifs = Multimodal.packAnimatedGifs(spark, spec,
      "id", "w", "h", "nf", "gb", "gs").toDF()
    // the container holds the REAL frame count
    val f = Multimodal.sampleFrames(spark, gifs, stride = 2)
      .collect().sortBy(x => (x.id, x.frame_idx))
    assert(f.map(x => (x.id, x.frame_idx, x.n_frames)).toSeq ==
      Seq((1L, 0L, 5L), (1L, 2L, 5L), (1L, 4L, 5L), (2L, 0L, 1L)))
    // frame grays 10, 84, 158 -> bins 0, 2, 4; constant 200 -> bin 6
    assert(f.map(_.frame_bin).toSeq == Seq(0, 2, 4, 6))
    // non-GIF payloads contribute no rows (None-degradation, no crash)
    val none = Multimodal.sampleFrames(spark, packed, stride = 2).count()
    assert(none == 0)
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

  test("feature extraction: real pixels → real histogram features") {
    import spark.implicits._
    val spec = Seq((10L, "png", 40, 30, 200, 40)).toDF("id", "fmt", "w", "h", "gt", "gb")
    val imgs = Multimodal.packPixelImages(spark, spec,
      "id", "fmt", "w", "h", "gt", "gb").toDF()
    val f = Multimodal.extractFeatures(spark, imgs).collect().head
    assert(f.width.contains(40) && f.height.contains(30))
    val feats = f.features.get
    // 15 rows at 200 (bin 6), 15 rows at 40 (bin 1), normalized
    assert(math.abs(feats(6) - 0.5f) < 1e-6 && math.abs(feats(1) - 0.5f) < 1e-6)
    assert(feats.sum > 0.999f && feats.sum < 1.001f)
  }

  test("feature extraction degrades: header-only dims, then all-null") {
    import spark.implicits._
    // header-only JPEG (x66's packer — valid SOF, no scan data): pixels
    // can't decode, dims still come from the container-header parse
    val spec = Seq((10L, "jpeg", 320, 200)).toDF("id", "fmt", "w", "h")
    val headerOnly = Multimodal.packImages(spark, spec, "id", "fmt", "w", "h").toDF()
    val f = Multimodal.extractFeatures(spark, headerOnly).collect().head
    assert(f.width.contains(320) && f.height.contains(200) && f.features.isEmpty)
    // packed text: not an image at all → all-null row, stable schema
    val feats = Multimodal.extractFeatures(spark, packed).toDF()
    assert(feats.columns.toSeq == Seq("id", "width", "height", "features"))
    assert(feats.count() == 3)
    assert(feats.filter(col("features").isNotNull).count() == 0)
  }

  test("perceptual hash: decoded hash equals the formula, brightness " +
      "shift is hash-invariant while every payload byte differs") {
    import spark.implicits._
    val spec = Seq(
      (1L, 42L, 33, 21, 10),   // base noise image
      (2L, 42L, 33, 21, 15),   // same pattern, +5 brightness
      (3L, 43L, 33, 21, 10))   // different pattern
      .toDF("id", "pat", "w", "h", "cb")
    val packed = Multimodal.packNoiseImages(spark, spec,
      "id", "pat", "w", "h", "cb").toDF()
    val hs = Multimodal.perceptualHash(spark, packed).collect()
      .map(r => r.id -> r).toMap
    // formula-expected hash for id 1, computed WITHOUT any decode
    val d = (0 until 64).map { i =>
      Multimodal.noiseGray(42L, (i % 8) * 33 / 8, (i / 8) * 21 / 8, 10).toLong
    }
    val expected = d.map(v => if (v * 64 > d.sum) '1' else '0').mkString
    assert(hs(1L).phash.contains(expected))
    // aHash invariance: +5 on every pixel moves the mean by +5 → same bits
    assert(hs(1L).phash == hs(2L).phash)
    // ...even though the encoded payloads share not even their size class
    val payloads = packed.select(col("id"), col("sha256")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(payloads(1L) != payloads(2L))
    // different pattern → different hash
    assert(hs(1L).phash != hs(3L).phash)
    // pairs: only the (1,2) twin survives radius 3
    val pairs = Multimodal.perceptualNearDups(
      Multimodal.perceptualHash(spark, packed).toDF(), radius = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)), pairs.toSeq)
  }

  test("perceptual hash: undecodable payloads yield null and never pair") {
    val hs = Multimodal.perceptualHash(spark, packed).toDF()   // text bytes
    assert(hs.filter(col("phash").isNotNull).count() == 0)
    assert(Multimodal.perceptualNearDups(hs).count() == 0)
  }
}
