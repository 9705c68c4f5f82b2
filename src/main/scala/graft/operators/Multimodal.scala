package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column conventions: media as opaque `binary` columns with a
  * typed metadata struct alongside, plus the Spark-side plumbing for
  * per-partition decode/feature-extraction.
  *
  * Header decode is REAL: [[decodeImageHeader]] parses PNG/JPEG/GIF
  * container bytes (signatures, chunk/marker framing, dimension fields)
  * with no codec dependency, and [[packImageHeader]] builds spec-valid
  * bytes for the reverse direction. Only pixel-level work (the feature
  * vector, resize resampling, frame extraction) remains a clearly-marked
  * deterministic STUB — the container has no image/audio codecs — while
  * the schema convention, binary packing, and `mapPartitions` batch shape
  * (one decoder instantiation per partition, streamed rows, no collect)
  * are production-real throughout.
  */
object Multimodal {

  case class MediaRow(id: Long, media_type: String, n_bytes: Long,
      sha256: String, payload: Array[Byte])
  case class Features(id: Long, width: Int, height: Int,
      features: Array[Float])
  /** A parsed image-container header: canonical format tag + pixel dims. */
  case class ImageHeader(format: String, width: Int, height: Int)
  case class DecodedHeader(id: Long, format: Option[String],
      width: Option[Int], height: Option[Int])

  /** Pack a text column as a media payload: binary bytes + typed metadata.
    * (Stands in for image/audio ingestion; same schema convention.) */
  def pack(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      lit(mediaType).as("media_type"),
      octet_length(encode(col(payloadCol), "utf-8")).cast("long").as("n_bytes"),
      sha2(encode(col(payloadCol), "utf-8"), 256).as("sha256"),
      encode(col(payloadCol), "utf-8").as("payload"))

  // ---- real image-container header parsing (public formats, pure
  //      byte-work, no codec dependency) --------------------------------

  private def be16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xFF) << 8) | (p(i + 1) & 0xFF)
  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
      ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** REAL header decode for the three classic raster containers — the
    * dimensions a curation pipeline filters/buckets on, parsed from the
    * bytes themselves (no codec, no library):
    *
    *   - PNG: 8-byte signature, then the mandatory first chunk must be
    *     IHDR — width/height are the two big-endian u32s at offsets
    *     16/20 (PNG spec, W3C).
    *   - JPEG: SOI marker then a marker-segment walk (each segment
    *     `FF mm len_hi len_lo payload…`) until a frame header SOFn
    *     (C0–CF minus C4/C8/CC which are DHT/JPG/DAC) — height/width
    *     are the big-endian u16s at segment offsets 3/5 (ITU T.81
    *     §B.2.2). Fill bytes (repeated FF) and standalone markers
    *     (TEM/RSTn) are skipped; hitting SOS or EOI first fails.
    *   - GIF: "GIF87a"/"GIF89a", then the logical-screen-descriptor
    *     little-endian u16 pair at offsets 6/8.
    *
    * Returns None for anything unparseable (truncated, not an image,
    * zero dims) — callers surface that as a null row, never a crash. */
  def decodeImageHeader(p: Array[Byte]): Option[ImageHeader] = {
    def ok(f: String, w: Long, h: Long): Option[ImageHeader] =
      if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
        Some(ImageHeader(f, w.toInt, h.toInt))
      else None
    if (p.length >= 24 && p.take(8).sameElements(PngSig) &&
        (12 until 16).map(i => p(i).toChar).mkString == "IHDR")
      ok("png", be32(p, 16), be32(p, 20))
    else if (p.length >= 10 &&
        (0 until 6).map(i => p(i).toChar).mkString.matches("GIF8[79]a"))
      ok("gif", le16(p, 6), le16(p, 8))
    else if (p.length >= 4 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8)
      jpegDims(p).flatMap { case (w, h) => ok("jpeg", w, h) }
    else None
  }

  private def jpegDims(p: Array[Byte]): Option[(Int, Int)] = {
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None // lost marker sync
      var j = i
      while (j + 1 < p.length && (p(j + 1) & 0xFF) == 0xFF) j += 1 // fill
      if (j + 1 >= p.length) return None
      val m = p(j + 1) & 0xFF
      if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i = j + 2
      else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before SOF
      else {
        if (j + 3 >= p.length) return None
        val len = be16(p, j + 2)
        if (len < 2) return None
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (j + 8 >= p.length) return None
          return Some((be16(p, j + 7), be16(p, j + 5))) // (width, height)
        }
        i = j + 2 + len
      }
    }
    None
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(tb).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(tb); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Build REAL (spec-valid, CRC-correct) container bytes for a given
    * format + dimensions — the ingestion-side twin of
    * [[decodeImageHeader]], used to turn tabular fixtures into genuine
    * binary payloads. PNG carries a proper IHDR+IEND chunk pair; JPEG
    * carries JFIF APP0, a comment segment, and a baseline SOF0 (so the
    * decoder's marker walk is actually exercised); GIF is an 87a
    * logical-screen descriptor. Pixel data is irrelevant to header
    * decode and omitted. */
  def packImageHeader(format: String, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    format match {
      case "png" =>
        val ihdr = java.nio.ByteBuffer.allocate(13)
          .putInt(width).putInt(height)
          .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        PngSig ++ pngChunk("IHDR", ihdr.array()) ++
          pngChunk("IEND", Array.emptyByteArray)
      case "jpeg" =>
        require(width <= 0xFFFF && height <= 0xFFFF, "JPEG dims are u16")
        val app0 = Array[Int](0xFF, 0xE0, 0, 16, 'J', 'F', 'I', 'F', 0,
          1, 1, 0, 0, 1, 0, 1, 0, 0)
        val com = Array[Int](0xFF, 0xFE, 0, 7) ++ "graft".map(_.toInt)
        val sof0 = Array[Int](0xFF, 0xC0, 0, 11, 8,
          height >> 8, height & 0xFF, width >> 8, width & 0xFF,
          1, 1, 0x11, 0)
        (Array(0xFF, 0xD8) ++ app0 ++ com ++ sof0 ++ Array(0xFF, 0xD9))
          .map(_.toByte)
      case "gif" =>
        require(width <= 0xFFFF && height <= 0xFFFF, "GIF dims are u16")
        "GIF87a".getBytes("US-ASCII") ++ Array[Int](
          width & 0xFF, width >> 8, height & 0xFF, height >> 8,
          0, 0, 0, 0x3B).map(_.toByte)
      case other => throw new IllegalArgumentException(
        s"unknown format '$other' (png|jpeg|gif)")
    }
  }

  /** Distributed ingestion twin: build real container bytes row-by-row
    * from (id, format, width, height) columns into the standard packed
    * MediaRow frame — map-side only, no shuffle; sha256/n_bytes computed
    * from the actual payload bytes. */
  def packImages(spark: SparkSession, df: DataFrame, idCol: String,
      formatCol: String, widthCol: String, heightCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(formatCol),
        col(widthCol).cast("int"), col(heightCol).cast("int"))
      .as[(Long, String, Int, Int)]
      .map { case (id, fmt, w, h) =>
        val payload = packImageHeader(fmt, w, h)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(payload).map("%02x".format(_)).mkString
        MediaRow(id, s"image/$fmt", payload.length.toLong, sha, payload)
      }
  }

  /** Distributed header decode over packed media rows: (id, format,
    * width, height), nulls where the payload isn't a parseable image.
    * Same per-partition batch shape as [[extractFeatures]] — one scan,
    * no shuffle, decode runs map-side where the bytes live. */
  def decodeHeaders(spark: SparkSession, packed: DataFrame): Dataset[DecodedHeader] = {
    import spark.implicits._
    packed.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          decodeImageHeader(payload) match {
            case Some(h) => DecodedHeader(id, Some(h.format), Some(h.width),
              Some(h.height))
            case None => DecodedHeader(id, None, None, None)
          }
        }
      }
  }

  /** STUB decoder — deterministic fake in place of a real codec (none in
    * this container). Derives pseudo-dimensions and an 8-float feature
    * vector from the payload bytes. Replace with e.g. a JNI/ONNX decoder;
    * the surrounding plumbing (schema, batching, partitioning) is real. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 1 + (payload.length % 64)
    val h = 1 + (payload.length % 48)
    // & 0xFF: UNSIGNED byte values — for ASCII payloads this equals the
    // code point (what the x13 oracle's ascii() computes); a signed Java
    // byte would go negative on any byte >= 0x80
    val feats = Array.tabulate(8) { i =>
      if (payload.isEmpty) 0f
      else (payload(i * payload.length / 8) & 0xFF).toFloat / 128f
    }
    (w, h, feats)
  }

  /** Per-partition feature extraction over packed media rows. The decoder
    * is constructed once per partition (the expensive-init pattern for
    * codecs/models); rows stream through without materializing the
    * partition. Dimensions come from the REAL container-header parse
    * ([[decodeImageHeader]]) whenever the payload is a parseable
    * PNG/JPEG/GIF; non-image payloads (e.g. packed text) fall back to the
    * deterministic pseudo-dims, and only the pixel-feature vector remains
    * stubbed (no codec in this container). */
  def extractFeatures(spark: SparkSession, packed: DataFrame): Dataset[Features] = {
    import spark.implicits._
    packed.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (decoder/model handle)
        rows.map { case (id, payload) =>
          val (sw, sh, f) = decodeStub(payload)
          decodeImageHeader(payload) match {
            case Some(h) => Features(id, h.width, h.height, f)
            case None => Features(id, sw, sh, f)
          }
        }
      }
  }

  /** STUB resize: a real implementation decodes, scales to
    * (targetW, targetH), re-encodes. The stub derives a deterministic
    * resized payload (truncated/cycled bytes) and rewrites the metadata —
    * the Spark shape (projection over binary, new payload + metadata,
    * no shuffle) is the real part. */
  def resize(packed: DataFrame, targetW: Int, targetH: Int): DataFrame =
    packed
      .withColumn("payload",
        expr(s"substring(payload, 1, int(least(n_bytes, ${targetW.toLong * targetH})))"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("media_type", concat(col("media_type"),
        lit(s";resized=${targetW}x$targetH")))
      .withColumn("sha256", sha2(col("payload"), 256))

  /** Payload near-duplicates: byte-block SimHash over the packed binary,
    * grouped per media_type — the multimodal twin of the x18 text
    * near-dup machinery ([[Dedup.simhashNearDups]]). Features are
    * OVERLAPPING `blockBytes`-byte windows of the payload (sliding by one
    * byte, as hex strings), so the signature survives insertions/shifts
    * the way text shingles do; the 64-bit signature and the pigeonhole
    * band join are exactly the x18 design — radius < bands guarantees
    * the banded result equals the all-pairs scan. NO codec stub in this
    * path: byte-block hashing is the real production algorithm for
    * near-identical binary payloads (re-encodes/crops need
    * decoded-feature ANN — [[extractFeatures]] + Similarity — instead).
    *
    * Scale shape: signatures are one per-row expression pass (the md5s
    * are the cost, ~n_bytes per row); candidates ride an id-only
    * (media_type, band, key) join — 16-bit band keys keep volume
    * ~n²/65536 per band within a media_type; the exact Hamming verify is
    * codegen'd integer xor/bit_count. Payloads shorter than `blockBytes`
    * carry no block evidence and are excluded (document-level exact dedup
    * already covers them via sha256).
    *
    * Returns (media_type, id_a, id_b, hamming), id_a < id_b. */
  def payloadNearDups(packed: DataFrame, radius: Int = 3, bands: Int = 4,
      blockBytes: Int = 4, scope: Option[CacheScope] = None): DataFrame = {
    require(radius < bands, "pigeonhole needs radius < bands")
    require(64 % bands == 0, "bands must divide 64")
    require(blockBytes > 0, "blockBytes must be positive")
    val bandLen = 64 / bands
    // persisted: the band join reads this relation on BOTH sides, and the
    // signature pass (one md5 per distinct block — the dominant cost) must
    // not run twice. id+sig rows only, so residency is tiny; same
    // documented cache-residency trade as LmScore.bigramNll. The
    // signature itself is the native one-pass expression (bit-compatible
    // with simhash64Native over hex-window tokens — MultimodalSpec
    // asserts the equality — but skips materializing the hex string and
    // the per-row block array).
    val sigs = CacheScope.route(scope,
      packed.filter(col("n_bytes") >= blockBytes)
        .select(col("media_type"), col("id"),
          graft.expressions.TextExpressions
            .byteBlockSimhash64(col("payload"), blockBytes).as("sig"))
        .withColumn("hi", conv(substring(col("sig"), 1, 32), 2, 10).cast("long"))
        .withColumn("lo", conv(substring(col("sig"), 33, 32), 2, 10).cast("long")))
    val banded = sigs.select(col("media_type"), col("id"), col("hi"), col("lo"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          substring(col("sig"), b * bandLen + 1, bandLen).as("key"))): _*))
        .as("bk"))
      .select(col("media_type"), col("id"), col("hi"), col("lo"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.select(col("media_type"), col("id").as("id_a"),
        col("hi").as("ha"), col("lo").as("la"), col("band"), col("key"))
      .join(banded.select(col("media_type"), col("id").as("id_b"),
        col("hi").as("hb"), col("lo").as("lb"), col("band"), col("key")),
        Seq("media_type", "band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("media_type"), col("id_a"), col("id_b"),
        (bit_count(expr("ha ^ hb")) + bit_count(expr("la ^ lb")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= radius)
      .dropDuplicates("media_type", "id_a", "id_b")
  }

  /** STUB frame sampling: every `stride`-th byte stands in for every
    * stride-th video frame. One input row explodes to its sampled-frame
    * rows (posexplode keeps frame order) — the genuinely Spark-side
    * concerns are the row-explosion shape and frame indexing. */
  def sampleFrames(packed: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    packed
      .select(col("id"), col("media_type"), col("payload"),
        posexplode(expr(
          s"CASE WHEN n_bytes > 0 THEN sequence(0, int(n_bytes) - 1, $stride)" +
            " ELSE cast(array() AS array<int>) END"))
          .as(Seq("frame_idx", "offset")))
      .select(col("id"), col("media_type"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr("substring(payload, offset + 1, 1)").as("frame_byte"))
  }
}
