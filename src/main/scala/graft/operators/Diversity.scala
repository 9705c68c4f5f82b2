package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Per-source lexical-diversity report — the corpus-health axis next
  * to volume/dup/quality shares (x47): type-token ratio, distinct-
  * bigram ratio (the distinct-n diversity family, Li et al. NAACL'16
  * §4.1), and unigram Shannon entropy. Template-generated or
  * over-deduplicated sources show up as LOW diversity at equal volume;
  * a source whose entropy is far below its peers is the first place to
  * look for boilerplate soup the per-doc filters missed.
  *
  * Entropy uses the count identity H = ln(N) − (Σ c·ln c)/N over the
  * source's unigram counts, so the corpus never materializes
  * probabilities: per-word ln c is rounded to 6dp then multiplied by
  * the EXACT integer count into an exact decimal sum —
  * summation-order independent, the float-aggregation parity rule.
  *
  * Scale shape: one explode → ONE (source, gram) count aggregation per
  * gram order (map-side combined), then a sources-sized rollup of each
  * — vocabulary-sized intermediates, sources-sized output, no windows,
  * no distinct over raw rows (distinct counts are ROW COUNTS of the
  * count tables). Ratios are integer half-up micro-rounded at 6dp. */
object Diversity {

  /** One row per source: (source, n_docs, n_tokens, distinct_tokens,
    * ttr, n_bigrams, distinct_bigrams, distinct2, entropy) — `ttr` =
    * distinct/total unigrams, `distinct2` the bigram analogue (null
    * when a source has no bigrams), `entropy` in nats (6dp). */
  def report(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val D6 = DecimalType(18, 6)
    val toks = docs.select(col(sourceCol).as("source"),
      col(idCol).as("doc_id"), split(col(textCol), " ").as("ts"))
    val docCounts = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val uni = toks
      .select(col("source"), explode(col("ts")).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
    val uniStats = uni.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("distinct_tokens"),
        sum(col("c") * round(log(col("c").cast(DoubleType)), 6).cast(D6))
          .as("slc"))
    val bg = toks
      .select(col("source"),
        explode(transform(slice(col("ts"), lit(1), size(col("ts")) - 1),
          (w, i) => concat(w, lit(" "),
            element_at(col("ts"), i + 2)))).as("b"))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("c"))
    val bgStats = bg.groupBy(col("source"))
      .agg(sum(col("c")).as("n_bigrams"),
        count(lit(1)).as("distinct_bigrams"))
    docCounts
      .join(uniStats, "source")
      .join(bgStats, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("distinct_tokens"),
        expr("CAST((distinct_tokens*2000000 + n_tokens) " +
          "DIV (2*n_tokens) AS DOUBLE)/1000000.0").as("ttr"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("distinct_bigrams"), lit(0L))
          .as("distinct_bigrams"),
        expr("CASE WHEN n_bigrams > 0 THEN " +
          "CAST((distinct_bigrams*2000000 + n_bigrams) " +
          "DIV (2*n_bigrams) AS DOUBLE)/1000000.0 END").as("distinct2"),
        graft.functions.PortableMath.roundPortable(
          round(log(col("n_tokens").cast(DoubleType)), 6)
          - col("slc").cast(DoubleType) / col("n_tokens"), 6)
          .as("entropy"))
  }
}
