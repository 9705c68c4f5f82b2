package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverse Cloze Task pair generation (Lee, Chang & Toutanova, "Latent
  * Retrieval for Weakly Supervised Open Domain Question Answering",
  * ACL 2019 §3.2): from each document, a pseudo-query span and its
  * surrounding context form a (query, positive-context) training pair
  * for retriever pretraining — no labels needed, the document structure
  * IS the supervision.
  *
  * The original samples a random sentence; this corpus is unpunctuated
  * token streams, so the query is a fixed-length token span at an
  * md5-derived deterministic offset (per-doc variety, engine-portable:
  * the hash arithmetic is the x87/x97 48-bit discipline). Documents too
  * short to leave context (< 2·qTokens) are dropped — a query with an
  * empty positive teaches nothing.
  *
  * Scale shape: ONE zero-shuffle per-row map (split, hash, slice,
  * join) — the whole generator is expression-only. */
object Ict {

  /** (idCol, start, query, context, n_tokens): query = qTokens tokens
    * at the md5-derived 0-based `start`; context = the remainder in
    * original order. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
      qTokens: Int = 8): DataFrame = {
    require(qTokens >= 1, "qTokens must be >= 1")
    val ts = split(col(textCol), " ")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    df.select(col(idCol), ts.as("ts"), size(ts).as("n"))
      // filter BEFORE the modulus: a doc shorter than the query span
      // would make the pmod divisor nonpositive
      .filter(col("n") >= 2 * qTokens)
      .withColumn("start",
        pmod(h, (col("n") - qTokens + 1).cast("long")).cast("int"))
      .select(col(idCol), col("start").cast("long").as("start"),
        array_join(slice(col("ts"), col("start") + 1, lit(qTokens)), " ")
          .as("query"),
        array_join(concat(
          slice(col("ts"), lit(1), col("start")),
          slice(col("ts"), col("start") + 1 + qTokens,
            col("n") - col("start") - qTokens)), " ").as("context"),
        col("n").cast("long").as("n_tokens"))
  }
}
