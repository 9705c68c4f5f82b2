package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared byte-fallback machinery of the tokenizer family (round-16,
  * the r15 verdict's gap 2 — SentencePiece's `byte_fallback`, Kudo &
  * Richardson EMNLP 2018 system demo): both trained tokenizers
  * ([[Unigram]] x212, [[Bpe]] x214) reserve 256 byte-token ids
  * DIRECTLY ABOVE their piece vocabulary — id V+1+b for byte value
  * b — so an out-of-vocabulary symbol degrades to its UTF-8 bytes
  * instead of raising, and one trained model can encode unseen text.
  * Decode concatenates every token's bytes IN ORDER and UTF-8-decodes
  * once, so a multi-byte codepoint split across consecutive byte
  * tokens reassembles exactly (a lone continuation byte is not a
  * string — hence bytes-then-decode, never per-token strings). */
private[operators] object ByteFallback {

  /** Cost per fallback byte in micro-nats ([[Unigram]]'s Viterbi):
    * above any real piece cost (ln(T/1)·10⁶ reaches ~27.6e6 only at
    * T ≈ 10¹² piece occurrences), so the byte path is strictly a last
    * resort and covered words segment exactly as without fallback;
    * far below the DP's INF sentinel over any real word length. The
    * DuckDB oracles use the same literal. */
  val BYTE_COST = 50000000L

  /** Reserved byte-token ids of one OOV symbol: its UTF-8 hex
    * expansion read two nibbles at a time — V+1+byte. The oracles
    * mirror the identical hex arithmetic. */
  def byteTokenIds(piece: Column, vocabSize: Long): Column = {
    val h = hex(org.apache.spark.sql.functions.encode(piece, "UTF-8"))
    transform(sequence(lit(0), octet_length(piece) - 1),
      b => lit(vocabSize + 1L) +
        conv(h.substr(b * 2 + 1, lit(2)), 16, 10).cast("long"))
  }

  /** Decode a byte-fallback id stream: `idSym` maps every NON-byte id
    * (0 = the word separator, 1..V = pieces) to its string symbol;
    * byte tokens (id > V) become the single byte id−V−1; everything
    * concatenates per document in token order as BYTES and decodes
    * UTF-8 once. An empty document (empty id array) keeps its row and
    * decodes to "". */
  def decodeBytes(encoded: DataFrame, idSym: DataFrame,
      vocabSize: Long): DataFrame = {
    import org.apache.spark.sql.functions.{decode => strDecode, encode => strEncode}
    encoded.select(col("doc_id"), posexplode_outer(col("token_ids"))
        .as(Seq("tpos", "id")))
      .join(broadcast(idSym), Seq("id"), "left")
      .withColumn("bin",
        when(col("id").isNull, lit(Array.emptyByteArray)) // empty doc
          .when(col("id") > vocabSize,
            unhex(lpad(hex(col("id") - vocabSize - 1L), 2, "0")))
          .otherwise(strEncode(col("sym"), "UTF-8")))
      .groupBy("doc_id")
      .agg(strDecode(aggregate(
          transform(array_sort(collect_list(struct(col("tpos"), col("bin")))),
            x => x.getField("bin")),
          lit(Array.emptyByteArray),
          (acc, b) => concat(acc, b)), "UTF-8").as("text"))
  }
}
