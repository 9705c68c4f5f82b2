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

  test("feature extraction streams per partition with stable schema") {
    val feats = Multimodal.extractFeatures(spark, packed).toDF()
    assert(feats.columns.toSeq == Seq("id", "width", "height", "features"))
    assert(feats.count() == 3)
    val f1 = feats.filter(col("id") === 1).collect().head
    assert(f1.getSeq[Float](f1.fieldIndex("features")).length == 8)
  }
}
