package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (Muthitacharoen, Mazières & Chen, "A
  * low-bandwidth network file system", SOSP 2001 — the LBFS boundary
  * rule behind every dedup store since): cut each document where a
  * rolling window hash hits a fixed residue, so chunk boundaries are a
  * function of CONTENT, not position. Insert one character at the
  * front of a near-copy and fixed-size chunks all shift and nothing
  * matches; content-defined chunks re-synchronize at the first
  * boundary after the edit, and every later chunk hash matches again —
  * the shift-robust dedup signal doc-level hashes (x01) and fixed
  * windows cannot give.
  *
  * Boundary rule (engine-portable BIGINT arithmetic, no rolling state):
  * position i (1-based, i >= w) ends a chunk iff
  *   (Σ_{j=0..w-1} code(char at i−w+1+j) · 31^{w−1−j} mod 2^20) mod
  *     (mask+1) == 0
  * — the classic polynomial window hash with literal precomputed
  * powers, so a SQL oracle replays it verbatim. Documents shorter than
  * `w` (or with no boundary) are one chunk. Chunks partition the text
  * losslessly (CdcSpec reassembles originals).
  *
  * Scale shape: boundary detection, span splitting, and chunk hashing
  * are zero-shuffle per-row array expressions (O(len·w) work per doc);
  * the only exchanges are the chunk-hash frequency aggregation and the
  * hash-keyed join back — chunk-sized rows, never full texts, cross
  * the wire. */
object Cdc {

  private val Mod = 1L << 20

  private def powers(w: Int): Seq[Long] =
    (0 until w).map(j =>
      (0 until (w - 1 - j)).foldLeft(1L)((a, _) => a * 31 % Mod))

  /** One row per chunk: (doc_id, chunk_idx, chunk_len, chunk_hash) —
    * chunk_hash = md5 of the chunk text, chunk_idx 0-based in document
    * order. Null/empty texts yield no rows. */
  def chunkHashes(df: DataFrame, idCol: String, textCol: String,
      w: Int = 16, mask: Int = 63): DataFrame = {
    require(w >= 2 && w <= 64, s"window $w outside 2..64")
    require(mask >= 1 && (mask & (mask + 1)) == 0,
      s"mask $mask must be 2^k - 1")
    val txt = col("__text")
    // spans: starts = 1 :: (bnds + 1), ends = bnds :: len; a boundary at
    // the final position would open an empty trailing span — filtered
    val spans = filter(
      zip_with(
        concat(array(lit(1)), transform(col("__bnds"), b => b + 1)),
        concat(col("__bnds"), array(length(txt))),
        (s, e) => struct(s.as("s"), e.as("e"))),
      sp => sp.getField("e") >= sp.getField("s"))
    df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .filter(col("__text").isNotNull && length(col("__text")) >= 1)
      .withColumn("__bnds", boundaryColumn(col("__text"), w, mask))
      .select(col("doc_id"), col("__text"),
        posexplode(spans).as(Seq("chunk_idx", "sp")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("sp.e") - col("sp.s") + 1).cast("long").as("chunk_len"),
        md5(col("__text").substr(col("sp.s"),
          col("sp.e") - col("sp.s") + 1)).as("chunk_hash"))
  }

  /** Per-document chunk-dedup report: (doc_id, n_chunks, n_dup_chunks,
    * dup_ratio_micro) — a chunk is DUP if its hash occurs >= 2 times
    * across the whole corpus (within- or cross-document). High
    * dup_ratio on a doc whose doc-level hash is unique is exactly the
    * shifted/partial near-copy x01 cannot see. */
  def dupChunkReport(df: DataFrame, idCol: String, textCol: String,
      w: Int = 16, mask: Int = 63,
      scope: Option[CacheScope] = None): DataFrame = {
    // persisted: the global frequency agg and the join probe both read
    // the chunk stream; unpersisted, every text re-chunks twice
    val chunks = CacheScope.route(scope,
      chunkHashes(df, idCol, textCol, w, mask))
    val freq = chunks.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("__cnt"))
    chunks.join(freq, "chunk_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__cnt") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        expr("n_dup_chunks * 1000000 div n_chunks").as("dup_ratio_micro"))
  }

  /** Exposed for spec/oracle parity checks. */
  private[operators] def powersFor(w: Int): Seq[Long] = powers(w)
  private[graft] def boundaryColumn(txt: Column, w: Int, mask: Int)
      : Column = {
    val p = typedlit(powers(w))
    when(length(txt) >= w,
      filter(sequence(lit(w), length(txt)), i =>
        aggregate(
          transform(sequence(lit(0), lit(w - 1)), j =>
            ascii(txt.substr(i - lit(w) + 1 + j, lit(1))) *
              element_at(p, j + 1)),
          lit(0L), (acc, x) => acc + x) % Mod % (mask + 1) === 0))
      .otherwise(array().cast("array<int>"))
  }
}
