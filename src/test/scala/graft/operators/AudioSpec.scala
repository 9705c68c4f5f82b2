package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Audio: WAV pack/decode round-trip, chunk-walk robustness, and
  * hand-computed metrics. */
class AudioSpec extends SparkSpec {

  test("pack/decode round-trip preserves rate and samples, junk chunk or not") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    for (junk <- Seq(false, true)) {
      val bytes = Audio.packWavPcm16(16000, samples, withJunkChunk = junk)
      val Some((rate, back)) = Audio.decodeWav(bytes)
      assert(rate == 16000 && back.sameElements(samples), s"junk=$junk")
    }
  }

  test("malformed payloads decode to None, never throw") {
    val good = Audio.packWavPcm16(8000, Array[Short](1, 2, 3))
    assert(Audio.decodeWav(good.take(6)).isEmpty, "truncated header")
    assert(Audio.decodeWav(good.dropRight(2)).isEmpty, "truncated data")
    assert(Audio.decodeWav(Array[Byte](1, 2, 3)).isEmpty, "not RIFF")
    assert(Audio.decodeWav("RIFF1234WAVE".getBytes).isEmpty, "no chunks")
    // stereo: patch channels=2 in fmt (offset 12+8+2 = 22)
    val stereo = good.clone(); stereo(22) = 2
    assert(Audio.decodeWav(stereo).isEmpty, "stereo refused")
    // 8-bit: patch bitsPerSample (offset 12+8+22 = 34)
    val eight = good.clone(); eight(34) = 8
    assert(Audio.decodeWav(eight).isEmpty, "8-bit refused")
    // non-PCM: patch audioFormat (offset 12+8 = 20)
    val ulaw = good.clone(); ulaw(20) = 7
    assert(Audio.decodeWav(ulaw).isEmpty, "non-PCM refused")
  }

  test("analyze: hand-computed metrics, windows, clipping incl. -32768") {
    import spark.implicits._
    // id 1: 4 zero samples then 2,-2 — window=2 → 3 windows, 2 silent;
    //       peak 2, sum_sq 8, no clipping
    // id 2: 32767,-32768,0,0 → peak 32768, sum_sq 32767²+32768²,
    //       clipped 2, windows 2, silent 1
    // id 3: corrupted payload → all null
    val rows = Seq(
      (1L, Audio.packWavPcm16(8000, Array[Short](0, 0, 0, 0, 2, -2))),
      (2L, Audio.packWavPcm16(8000, Array[Short](32767, -32768, 0, 0))),
      (3L, Array[Byte](9, 9, 9))).toDF("id", "payload")
    val m = Audio.analyze(spark, rows, windowSamples = 2).collect()
      .map(r => r.id -> r).toMap
    val a = m(1L)
    assert(a.peak_abs.contains(2L) && a.sum_sq.contains(8L) &&
      a.n_clipped.contains(0L) && a.n_windows.contains(3L) &&
      a.n_silent_windows.contains(2L) && a.duration_ms.contains(0L))
    val b = m(2L)
    assert(b.peak_abs.contains(32768L) &&
      b.sum_sq.contains(32767L * 32767 + 32768L * 32768) &&
      b.n_clipped.contains(2L) && b.n_windows.contains(2L) &&
      b.n_silent_windows.contains(1L))
    val c = m(3L)
    assert(c.sample_rate.isEmpty && c.n_samples.isEmpty &&
      c.sum_sq.isEmpty && c.n_silent_windows.isEmpty)
  }

  test("silencePeak threshold: low-amplitude noise counts as silence") {
    import spark.implicits._
    val rows = Seq(
      (1L, Audio.packWavPcm16(8000, Array[Short](3, -3, 500, 500))))
      .toDF("id", "payload")
    val m = Audio.analyze(spark, rows, windowSamples = 2, silencePeak = 4)
      .collect().head
    assert(m.n_windows.contains(2L) && m.n_silent_windows.contains(1L))
  }

  test("packWav dataset: media_type/n_bytes/sha match the payload bytes") {
    import spark.implicits._
    val df = Seq((5L, 8000, Seq(1, -1, 0))).toDF("id", "rate", "samples")
    val row = Audio.packWav(spark, df, "id", "rate", "samples").collect().head
    assert(row.media_type == "audio/wav" &&
      row.n_bytes == row.payload.length.toLong)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(row.payload).map("%02x".format(_)).mkString
    assert(row.sha256 == sha)
    // junk-chunk branch: even id → JUNK chunk present, still decodes
    val Some((r2, s2)) = Audio.decodeWav(
      Audio.packWav(spark, Seq((4L, 8000, Seq(9))).toDF("id", "rate",
        "samples"), "id", "rate", "samples").collect().head.payload)
    assert(r2 == 8000 && s2.sameElements(Array[Short](9)))
  }

  test("trimSilence: lead/trail stripped, round-trip decodes, edge cases") {
    import spark.implicits._
    val rows = Seq(
      // 2 lead + 3 signal + 1 trail
      (1L, Audio.packWavPcm16(8000, Array[Short](0, 0, 5, -7, 5, 0))),
      // all-silent -> zero-sample valid WAV
      (2L, Audio.packWavPcm16(8000, Array[Short](0, 0, 0))),
      // nothing to trim
      (3L, Audio.packWavPcm16(8000, Array[Short](9, 9))),
      // undecodable passthrough
      (4L, Array[Byte](1, 2, 3))).toDF("id", "payload")
    val m = Audio.trimSilence(spark, rows).collect().map(r => r.id -> r).toMap
    val a = m(1L)
    assert(a.trimmed && a.n_in.contains(6L) && a.n_out.contains(3L) &&
      a.lead_trimmed.contains(2L) && a.trail_trimmed.contains(1L))
    val Some((8000, back)) = Audio.decodeWav(a.payload)
    assert(back.sameElements(Array[Short](5, -7, 5)))
    assert(a.n_bytes == 44 + 6 && a.n_bytes == a.payload.length.toLong)
    val b = m(2L)
    assert(b.trimmed && b.n_out.contains(0L) &&
      Audio.decodeWav(b.payload).exists(_._2.isEmpty))
    val c = m(3L)
    assert(c.n_out.contains(2L) && c.lead_trimmed.contains(0L) &&
      c.trail_trimmed.contains(0L))
    val d = m(4L)
    assert(!d.trimmed && d.n_in.isEmpty &&
      d.payload.sameElements(Array[Byte](1, 2, 3)))
  }

  test("trimSilence honors silencePeak: low-amplitude margins trimmed") {
    import spark.implicits._
    val rows = Seq(
      (1L, Audio.packWavPcm16(8000, Array[Short](2, -2, 100, 2, 2))))
      .toDF("id", "payload")
    val m = Audio.trimSilence(spark, rows, silencePeak = 3).collect().head
    assert(m.lead_trimmed.contains(2L) && m.trail_trimmed.contains(2L) &&
      Audio.decodeWav(m.payload).exists(_._2.sameElements(Array[Short](100))))
  }

  test("duration uses integer millis: 44100 Hz, 44099 samples -> 999 ms") {
    val bytes = Audio.packWavPcm16(44100, new Array[Short](44099))
    import spark.implicits._
    val m = Audio.analyze(spark,
      Seq((1L, bytes)).toDF("id", "payload")).collect().head
    assert(m.duration_ms.contains(999L) && m.n_samples.contains(44099L))
  }

  test("resample: box filter, truncating division, ragged tail dropped") {
    import spark.implicits._
    // frames (4,-2) -> 1 and (-5,2) -> -1 (toward-zero: -3/2 = -1);
    // tail sample 7 has no complete frame
    val rows = Seq(
      (1L, Audio.packWavPcm16(8000, Array[Short](4, -2, -5, 2, 7))),
      (2L, Array[Byte](9, 9, 9))) // undecodable passthrough
    val out = Audio.resample(spark, rows.toDF("id", "payload"))
      .collect().map(r => r.id -> r).toMap
    val r1 = out(1L)
    assert(r1.resampled && r1.rate_in.contains(8000L) &&
      r1.rate_out.contains(4000L) && r1.n_in.contains(5L) &&
      r1.n_out.contains(2L) && r1.peak_out.contains(1L) &&
      r1.sum_sq_out.contains(2L) && r1.duration_out_ms.contains(0L))
    val Some((rate, back)) = Audio.decodeWav(r1.payload)
    assert(rate == 4000 && back.sameElements(Array[Short](1, -1)),
      "re-encoded payload decodes to the filtered signal")
    assert(r1.n_bytes == r1.payload.length.toLong)
    val r2 = out(2L)
    assert(!r2.resampled && r2.rate_in.isEmpty &&
      r2.payload.sameElements(Array[Byte](9, 9, 9)))
  }

  test("resample: factor must divide the rate — loud error, not a wrong header") {
    import spark.implicits._
    val rows = Seq((1L, Audio.packWavPcm16(8000, Array[Short](1, 2, 3, 4))))
    val e = intercept[Exception] {
      Audio.resample(spark, rows.toDF("id", "payload"), factor = 3).collect()
    }
    assert(e.toString.contains("does not divide") ||
      Option(e.getCause).exists(_.toString.contains("does not divide")))
    intercept[IllegalArgumentException] {
      Audio.resample(spark, rows.toDF("id", "payload"), factor = 1)
    }
  }

  test("synthSquare == the transform(sequence) HOF it replaced") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the x117/x121/x130 fixture grid: silent prefix q, square wave of
    // half-period halfp, silent suffix r — including the degenerate
    // q = r = 0 (x130) and r = 0 (x117) corners
    val spec = Seq(
      (1L, 8000, 10, 500, 4, 0, 0),
      (2L, 16000, 13, 32767, 2, 3, 0),
      (3L, 44100, 20, 1500, 5, 4, 3),
      (4L, 8000, 7, 900, 1, 2, 2),
      (5L, 8000, 6, 100, 3, 3, 3)) // all-silent (q + r = n)
      .toDF("doc_id", "rate", "n", "amp", "halfp", "q", "r")
    val hof = spec.withColumn("samples", expr(
      """transform(sequence(0, n - 1), i ->
           CASE WHEN i < q OR i >= n - r THEN 0
                WHEN ((i - q) div halfp) % 2 = 0 THEN amp
                ELSE -amp END)"""))
      .select(col("doc_id"), col("rate"), col("samples"))
      .as[(Long, Int, Array[Int])].collect().sortBy(_._1)
    val native = Audio.synthSquare(spark, spec)
      .as[(Long, Int, Array[Int])].collect().sortBy(_._1)
    assert(hof.length == native.length)
    hof.zip(native).foreach { case ((hi, hr, hs), (ni, nr, ns)) =>
      assert(hi == ni && hr == nr, s"row mismatch at $hi")
      assert(hs.sameElements(ns), s"samples differ for doc $hi: " +
        s"${hs.mkString(",")} vs ${ns.mkString(",")}")
    }
  }
}
