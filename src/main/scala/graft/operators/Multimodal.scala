package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column conventions: media as opaque `binary` columns with a
  * typed metadata struct alongside, plus the Spark-side plumbing for
  * per-partition decode/feature-extraction.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB — the real parts are the schema
  * convention, the binary packing, and the `mapPartitions` batch shape
  * (one decoder instantiation per partition, streamed rows, no collect).
  */
object Multimodal {

  case class MediaRow(id: Long, media_type: String, n_bytes: Long,
      sha256: String, payload: Array[Byte])
  case class Features(id: Long, width: Int, height: Int,
      features: Array[Float])

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
    * partition. */
  def extractFeatures(spark: SparkSession, packed: DataFrame): Dataset[Features] = {
    import spark.implicits._
    packed.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (decoder/model handle)
        rows.map { case (id, payload) =>
          val (w, h, f) = decodeStub(payload)
          Features(id, w, h, f)
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
      blockBytes: Int = 4): DataFrame = {
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
    val sigs = packed.filter(col("n_bytes") >= blockBytes)
      .select(col("media_type"), col("id"),
        graft.expressions.TextExpressions
          .byteBlockSimhash64(col("payload"), blockBytes).as("sig"))
      .withColumn("hi", conv(substring(col("sig"), 1, 32), 2, 10).cast("long"))
      .withColumn("lo", conv(substring(col("sig"), 33, 32), 2, 10).cast("long"))
      .persist()
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
