package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for context-window preparation: split each document
  * into ~`chunkTokens`-token windows advancing by `stride` tokens
  * (overlap = chunkTokens − stride), the standard prep step before
  * tokenize-and-pack when documents exceed the training context. The
  * final window is kept only when it contributes tokens the previous
  * window didn't cover (`s + overlap < n`), so no chunk is a strict
  * suffix-duplicate of its predecessor.
  *
  * Scale shape: entirely per-row array expressions (split once, one
  * `transform` over the filtered start positions, one `posexplode`) —
  * zero shuffle, zero joins; output volume ≈ input · n/stride. Pair
  * with [[Sampling.packByTokenBudget]] downstream to pack the chunks
  * into training bins.
  */
object Chunking {

  /** (doc_id, chunk_idx, chunk_text, n_chunk_tokens) per window. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val overlap = chunkTokens - stride
    val chunks = expr(
      s"""transform(
         |  filter(sequence(0, greatest(size(ts) - 1, 0), $stride),
         |         s -> s = 0 OR s + $overlap < size(ts)),
         |  s -> struct(
         |    array_join(slice(ts, s + 1, $chunkTokens), ' ') AS chunk_text,
         |    least($chunkTokens, size(ts) - s) AS n_chunk_tokens))""".stripMargin)
    // NULL text would otherwise emit a phantom chunk (size(null) = -1
    // keeps start 0, slice(null) = null, token count -1) — drop the row
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ts"))
      .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_chunk_tokens").cast("long").as("n_chunk_tokens"))
  }
}
