package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style keep-one corpus segment dedup (Raffel et al., "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
  * JMLR 2020 §2.2: "we discarded all but one of any three-sentence span
  * occurring more than once in the data set").
  *
  * The unit here is a non-overlapping `segWords`-word segment (the
  * word-stream analogue of C4's three-sentence span — this corpus has no
  * sentence boundaries), and the policy is KEEP-FIRST: the globally
  * first occurrence of a repeated segment, by (doc id, position),
  * survives; every later occurrence is cut. That is a different
  * operation from [[Dedup.removeRepeatedSpans]] (x38), which strips ALL
  * occurrences of overlapping winnow-class n-grams — the
  * boilerplate-stripping variant. Keep-first preserves exactly one copy
  * of legitimate content that happens to be popular; remove-all is the
  * right call only for chrome/boilerplate.
  *
  * Scale shape (corpus-size-proportional frames, never quadratic):
  *   1. per doc, map-side: split once, hash each non-overlapping segment
  *      (md5 — the shuffle moves 32-byte keys + int positions, never
  *      segment text);
  *   2. ONE hash-keyed shuffle: a window over `seg_hash` ranks
  *      occurrences by (doc, position) and counts them — an occurrence
  *      is cut iff its hash repeats (count >= minCount) and it is not
  *      rank 1;
  *   3. cut positions aggregate to a per-doc sorted index list (bounded
  *      by segments-per-document, not corpus size) and join back to the
  *      input on doc id;
  *   4. rebuild map-side: a token at position j belongs to segment
  *      j / segWords, so the keep test is a codegen'd higher-order
  *      filter over (tokens x cut-list) — no shuffle.
  *
  * Returns (doc_id, clean_text, n_segments, n_removed) for every input
  * document; docs with nothing cut pass through text-intact.
  */
object SegmentDedup {

  def keepFirst(df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 15, minCount: Long = 2L): DataFrame = {
    require(segWords >= 1, "segWords must be >= 1")
    require(minCount >= 2L, "minCount < 2 would cut first occurrences too")
    val k = segWords
    val nSeg = ((size(col("toks")) + lit(k - 1)) / lit(k)).cast("int")
    val segs = df
      .select(col(idCol).as("doc"), split(col(textCol), " ").as("toks"))
      .select(col("doc"),
        posexplode(transform(sequence(lit(0), nSeg - 1),
          i => md5(array_join(slice(col("toks"), i * k + 1, lit(k)), " "))))
          .as(Seq("seg_idx", "sh")))
    val byHash = Window.partitionBy(col("sh"))
    val ranked = segs
      .withColumn("rn",
        row_number().over(byHash.orderBy(col("doc"), col("seg_idx"))))
      .withColumn("cnt", count(lit(1)).over(byHash))
    val cut = ranked
      .filter(col("cnt") >= minCount && col("rn") > 1)
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("seg_idx"))).as("cut_idx"))
    df.join(cut, df(idCol) === cut("doc"), "left")
      .select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"),
        coalesce(col("cut_idx"), array().cast("array<int>")).as("cut_idx"))
      .withColumn("kept",
        filter(col("toks"), (_, j) =>
          !array_contains(col("cut_idx"), (j / lit(k)).cast("int"))))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("clean_text"),
        ((size(col("toks")) + lit(k - 1)) / lit(k)).cast("long")
          .as("n_segments"),
        size(col("cut_idx")).cast("long").as("n_removed"))
  }
}
