package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.TextExpressions.deflateLength

/** Compression-ratio quality signal: how much smaller a document's UTF-8
  * bytes get under DEFLATE. Repetitive machine-generated boilerplate
  * compresses far below natural prose, so pipelines threshold on the
  * ratio (one scalar summarizing the Gopher repetition-rule family, Rae
  * et al. arXiv:2112.11446 §A1.1).
  *
  * Pure map-side: one native [[graft.expressions.DeflateLength]] pass
  * per row, zero shuffles. The raw compressed byte count is
  * zlib-implementation-specific, so the cross-engine-checkable outputs
  * are INEQUALITY verdicts; the ratio itself feeds Spark-side filters
  * (`compressionSignals(df).filter(col("deflate_ratio") < 0.9)`).
  *
  * Emitted per row:
  *  - n_bytes: UTF-8 byte length (engine-portable);
  *  - deflate_len / deflate_ratio: the signal (Spark-side use);
  *  - repeat_gain_ok: compressing the text repeated 4× costs LESS than
  *    4× the single compression — DEFLATE's back-references must exploit
  *    the repetition (a broken/identity codec fails this);
  *  - ratio_sane: 0 < deflate_len <= n_bytes + 64 (DEFLATE's stored-block
  *    overhead bound: ~5 bytes per 64 KiB window plus the 2-byte-ish
  *    header — 64 is generous for any input this corpus holds).
  */
object CompressionSignal {

  def compressionSignals(df: DataFrame, textCol: String,
      level: Int = 6): DataFrame = {
    val nBytes = octet_length(col(textCol)).cast("long")
    val c1 = deflateLength(col(textCol), level)
    val c4 = deflateLength(concat(col(textCol), col(textCol),
      col(textCol), col(textCol)), level)
    df.withColumn("n_bytes", nBytes)
      .withColumn("deflate_len", c1)
      .withColumn("deflate_ratio",
        round(col("deflate_len").cast("double") / col("n_bytes"), 4))
      .withColumn("repeat_gain_ok", c4 < c1 * 4)
      .withColumn("ratio_sane",
        col("deflate_len") > 0 && col("deflate_len") <= col("n_bytes") + 64)
  }
}
