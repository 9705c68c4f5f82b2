package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-column conventions: sound as opaque `binary` WAV payloads with
  * typed metadata alongside — the audio member of the multimodal family
  * ([[Multimodal]] is the image twin).
  *
  * Everything here is REAL byte-work on the public RIFF/WAVE container
  * (Microsoft/IBM 1991 spec; chunk framing, little-endian fields, odd-size
  * pad bytes): [[packWavPcm16]] builds spec-valid PCM-16 mono WAV bytes,
  * [[decodeWav]] walks the chunk list back to (sampleRate, samples), and
  * [[analyze]] computes the curation signals an audio pipeline gates on —
  * duration, peak, energy (integer sum of squares — no float drift),
  * clipping rate, and windowed silence ratio (the energy-threshold VAD
  * shape). Decode runs map-side where the bytes live (`mapPartitions`,
  * one scan, no shuffle) — the 100 TB plumbing; unparseable payloads
  * degrade to null rows, never crash.
  */
object Audio {

  case class AudioRow(id: Long, media_type: String, n_bytes: Long,
      sha256: String, payload: Array[Byte])
  /** Integer-exact per-payload signals; all None when the payload isn't a
    * parseable PCM-16 mono WAV. `sum_sq` = Σ s² (energy without the
    * engine-dependent sqrt — callers derive RMS when they need it);
    * `n_clipped` counts |s| ≥ 32767; windows are complete
    * `windowSamples`-sized spans, silent iff every |s| ≤ `silencePeak`. */
  case class AudioMetrics(id: Long, sample_rate: Option[Long],
      n_samples: Option[Long], duration_ms: Option[Long],
      peak_abs: Option[Long], sum_sq: Option[Long], n_clipped: Option[Long],
      n_windows: Option[Long], n_silent_windows: Option[Long])

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def rdLe16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)
  private def rdLe32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xFFL) | ((p(i + 1) & 0xFFL) << 8) |
      ((p(i + 2) & 0xFFL) << 16) | ((p(i + 3) & 0xFFL) << 24)
  private def tag(p: Array[Byte], i: Int): String =
    (i until i + 4).map(j => p(j).toChar).mkString

  /** Build REAL RIFF/WAVE bytes: PCM-16 mono, little-endian samples.
    * `withJunkChunk` inserts an odd-sized JUNK chunk (plus its RIFF pad
    * byte) before `fmt ` so round-trips exercise the walker's skip+pad
    * path, not just the happy layout. */
  def packWavPcm16(sampleRate: Int, samples: Array[Short],
      withJunkChunk: Boolean = false): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xFF).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val junk = if (withJunkChunk)
      "JUNK".getBytes("US-ASCII") ++ le32(3) ++
        "odd".getBytes("US-ASCII") ++ Array(0.toByte) // odd size → pad byte
    else Array.emptyByteArray
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate * 2) ++
      le16(2) ++ le16(16)
    val dataChunk = "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    val body = "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ dataChunk
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** REAL WAV decode: verify RIFF/WAVE framing, walk the chunk list
    * (skipping unknown chunks, honoring the odd-size pad byte), read
    * `fmt ` and `data`, and return (sampleRate, samples). None for
    * anything that isn't a complete PCM(1) mono 16-bit WAV — truncated,
    * compressed, stereo, other depths, data before fmt, or trailing
    * garbage where a chunk header should be. */
  def decodeWav(p: Array[Byte]): Option[(Int, Array[Short])] = {
    if (p.length < 12 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE")
      return None
    var i = 12
    var rate = -1
    var okFmt = false
    while (i + 8 <= p.length) {
      val t = tag(p, i)
      val sz = rdLe32(p, i + 4)
      if (sz < 0 || i + 8 + sz > p.length) return None
      val szi = sz.toInt
      if (t == "fmt ") {
        if (szi < 16) return None
        val audioFormat = rdLe16(p, i + 8)
        val channels = rdLe16(p, i + 10)
        val bits = rdLe16(p, i + 22)
        rate = rdLe32(p, i + 12).toInt
        okFmt = audioFormat == 1 && channels == 1 && bits == 16 && rate > 0
      } else if (t == "data") {
        if (!okFmt) return None // fmt must precede data (and be PCM mono 16)
        if (szi % 2 != 0) return None
        val out = new Array[Short](szi / 2)
        var j = 0
        while (j < out.length) {
          out(j) = rdLe16(p, i + 8 + 2 * j).toShort
          j += 1
        }
        return Some((rate, out))
      }
      i += 8 + szi + (szi & 1) // RIFF: odd-sized chunks carry a pad byte
    }
    None
  }

  /** Distributed ingestion twin of [[packWavPcm16]]: build real WAV bytes
    * row-by-row from (id, sampleRate, samples[]) columns into the standard
    * packed media frame — map-side only, no shuffle; sha256/n_bytes from
    * the actual payload bytes ([[Multimodal.packImages]] convention). */
  def packWav(spark: SparkSession, df: DataFrame, idCol: String,
      rateCol: String, samplesCol: String): Dataset[AudioRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(rateCol).cast("int"),
        col(samplesCol).cast("array<int>"))
      // Array[Int], not Seq[Int]: the primitive-array encoder copies the
      // unsafe buffer in one shot where the Seq encoder boxes per sample
      // (millions of samples per partition on the synth fixtures)
      .as[(Long, Int, Array[Int])]
      .map { case (id, rate, samples) =>
        val shorts = new Array[Short](samples.length)
        var si = 0
        while (si < samples.length) {
          shorts(si) = samples(si).toShort; si += 1
        }
        val payload = packWavPcm16(rate, shorts,
          withJunkChunk = id % 2 == 0)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(payload).map("%02x".format(_)).mkString
        AudioRow(id, "audio/wav", payload.length.toLong, sha, payload)
      }
  }

  /** Square-wave sample synthesis for the audio fixture queries, as ONE
    * primitive-array map: sample i is 0 on the silent prefix (`i < q`)
    * and suffix (`i >= n − r`), else ±amp with half-period `halfp`
    * phased from the prefix end — exactly the
    * `transform(sequence(0, n−1), …)` HOF it replaces (that form paid an
    * interpreted lambda per SAMPLE, millions per partition on these
    * fixtures; AudioSpec pins value equality). Expects int columns
    * (doc_id/rate/n/amp/halfp/q/r); emits the packWav input frame
    * (doc_id, rate, samples). Map-side, order-preserving. */
  def synthSquare(spark: SparkSession, spec: DataFrame): DataFrame = {
    import spark.implicits._
    spec.select(col("doc_id").cast("long"), col("rate").cast("int"),
        col("n").cast("int"), col("amp").cast("int"),
        col("halfp").cast("int"), col("q").cast("int"), col("r").cast("int"))
      .as[(Long, Int, Int, Int, Int, Int, Int)]
      .map { case (id, rate, n, amp, halfp, q, r) =>
        val out = new Array[Int](n)
        var i = q
        val end = n - r
        while (i < end) {
          out(i) = if ((((i - q) / halfp) & 1) == 0) amp else -amp
          i += 1
        }
        (id, rate, out)
      }
      .toDF("doc_id", "rate", "samples")
  }

  /** Silence-trim output: trimmed payload re-encoded as a spec-valid WAV
    * (same rate); `trimmed = false` marks undecodable payloads (passed
    * through unchanged, never dropped — the [[Multimodal.ResizedRow]]
    * convention). Counts are None exactly when `trimmed` is false. */
  case class TrimmedRow(id: Long, media_type: String, n_bytes: Long,
      sha256: String, payload: Array[Byte], trimmed: Boolean,
      n_in: Option[Long], n_out: Option[Long], lead_trimmed: Option[Long],
      trail_trimmed: Option[Long], duration_out_ms: Option[Long])

  /** Trim leading/trailing silence (|s| ≤ `silencePeak`) — the standard
    * audio-curation normalization before windowing/packing. Decode,
    * locate the first/last above-threshold sample, slice, re-encode
    * ([[packWavPcm16]], canonical layout). An ALL-silent payload trims
    * to zero samples (a valid empty WAV), not an error. Map-side
    * `mapPartitions` like [[analyze]] — no shuffle. */
  def trimSilence(spark: SparkSession, packed: DataFrame,
      silencePeak: Int = 0): Dataset[TrimmedRow] = {
    import spark.implicits._
    packed.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          decodeWav(payload) match {
            case Some((rate, s)) =>
              var i0 = 0
              while (i0 < s.length && math.abs(s(i0).toInt) <= silencePeak)
                i0 += 1
              var i1 = s.length - 1
              while (i1 >= i0 && math.abs(s(i1).toInt) <= silencePeak)
                i1 -= 1
              val out = java.util.Arrays.copyOfRange(s, i0, i1 + 1)
              val bytes = packWavPcm16(rate, out)
              val sha = java.security.MessageDigest.getInstance("SHA-256")
                .digest(bytes).map("%02x".format(_)).mkString
              TrimmedRow(id, "audio/wav", bytes.length.toLong, sha, bytes,
                trimmed = true, Some(s.length.toLong), Some(out.length.toLong),
                Some(i0.toLong), Some((s.length - i0 - out.length).toLong),
                Some(out.length.toLong * 1000L / rate))
            case None =>
              val sha = java.security.MessageDigest.getInstance("SHA-256")
                .digest(payload).map("%02x".format(_)).mkString
              TrimmedRow(id, "audio/wav", payload.length.toLong, sha, payload,
                trimmed = false, None, None, None, None, None)
          }
        }
      }
  }

  /** Resample output: decimated payload re-encoded as a spec-valid WAV
    * at `rate/factor`; `resampled = false` marks undecodable payloads
    * (passed through unchanged, never dropped). peak/sum_sq are the
    * OUTPUT signal's, so the filter math is verifiable in-query. */
  case class ResampledRow(id: Long, media_type: String, n_bytes: Long,
      sha256: String, payload: Array[Byte], resampled: Boolean,
      rate_in: Option[Long], rate_out: Option[Long], n_in: Option[Long],
      n_out: Option[Long], peak_out: Option[Long], sum_sq_out: Option[Long],
      duration_out_ms: Option[Long])

  /** Integer decimation by `factor` with a `factor`-tap box (moving
    * average) anti-alias filter — the standard cheap downsampler:
    * out(j) = (s(jf) + … + s(jf+f-1)) / f with truncating (toward-zero)
    * integer division, complete frames only (a ragged tail frame would
    * bias the last sample small-file-dependently — [[analyze]]'s
    * complete-window rule). `factor` must divide the sample rate (a
    * fractional output rate isn't representable in the WAV header; the
    * violation is a LOUD per-row error, never a silent wrong rate).
    * Map-side `mapPartitions` like [[analyze]] — no shuffle. */
  def resample(spark: SparkSession, packed: DataFrame,
      factor: Int = 2): Dataset[ResampledRow] = {
    require(factor >= 2, s"bad factor $factor")
    import spark.implicits._
    packed.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          decodeWav(payload) match {
            case Some((rate, s)) =>
              if (rate % factor != 0)
                throw new IllegalArgumentException(
                  s"row $id: factor $factor does not divide rate $rate")
              val n = s.length / factor
              val out = new Array[Short](n)
              var peak = 0L; var sumSq = 0L
              var j = 0
              while (j < n) {
                var acc = 0
                var i = j * factor
                val end = i + factor
                while (i < end) { acc += s(i); i += 1 }
                val v = acc / factor
                out(j) = v.toShort
                val a = math.abs(v).toLong
                if (a > peak) peak = a
                sumSq += v.toLong * v
                j += 1
              }
              val bytes = packWavPcm16(rate / factor, out)
              val sha = java.security.MessageDigest.getInstance("SHA-256")
                .digest(bytes).map("%02x".format(_)).mkString
              ResampledRow(id, "audio/wav", bytes.length.toLong, sha, bytes,
                resampled = true, Some(rate.toLong),
                Some((rate / factor).toLong), Some(s.length.toLong),
                Some(n.toLong), Some(peak), Some(sumSq),
                Some(n.toLong * 1000L / (rate / factor)))
            case None =>
              val sha = java.security.MessageDigest.getInstance("SHA-256")
                .digest(payload).map("%02x".format(_)).mkString
              ResampledRow(id, "audio/wav", payload.length.toLong, sha,
                payload, resampled = false, None, None, None, None, None,
                None, None)
          }
        }
      }
  }

  /** Distributed audio analysis over packed rows: decode map-side, emit
    * the integer-exact signal set (see [[AudioMetrics]]). Windowed
    * silence uses COMPLETE `windowSamples`-spans only (a ragged tail
    * window would bias the ratio small-file-dependently). */
  def analyze(spark: SparkSession, packed: DataFrame,
      windowSamples: Int = 160, silencePeak: Int = 0): Dataset[AudioMetrics] = {
    require(windowSamples > 0, s"bad window $windowSamples")
    import spark.implicits._
    packed.select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          decodeWav(payload) match {
            case Some((rate, s)) =>
              var peak = 0L; var sumSq = 0L; var clipped = 0L
              var i = 0
              while (i < s.length) {
                val a = math.abs(s(i).toInt).toLong
                if (a > peak) peak = a
                sumSq += s(i).toLong * s(i)
                if (a >= 32767L) clipped += 1
                i += 1
              }
              val nWin = s.length / windowSamples
              var silent = 0L
              var w = 0
              while (w < nWin) {
                var j = w * windowSamples
                val end = j + windowSamples
                var quiet = true
                while (quiet && j < end) {
                  if (math.abs(s(j).toInt) > silencePeak) quiet = false
                  j += 1
                }
                if (quiet) silent += 1
                w += 1
              }
              AudioMetrics(id, Some(rate.toLong), Some(s.length.toLong),
                Some(s.length.toLong * 1000L / rate), Some(peak),
                Some(sumSq), Some(clipped), Some(nWin.toLong), Some(silent))
            case None =>
              AudioMetrics(id, None, None, None, None, None, None, None, None)
          }
        }
      }
  }
}
