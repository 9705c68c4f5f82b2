package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document memorization-risk screen: how much of a document's
  * content is REPEATED VERBATIM elsewhere in the corpus. Sequence-level
  * duplication is the dominant predictor of verbatim memorization in
  * language models (Carlini et al., "Quantifying Memorization Across
  * Neural Language Models", arXiv:2202.07646: memorization scales
  * log-linearly with duplicate count; Kandpal, Wallace & Raffel,
  * ICML 2022: deduplication mitigates the associated privacy risk), so
  * a pre-training pipeline wants this report BEFORE sampling decides
  * how many epochs each document effectively sees.
  *
  * For each document, over its distinct word n-gram shingles:
  *   - `n_shingles`  — distinct shingles in the doc;
  *   - `n_exposed`   — shingles occurring in >= minDocs distinct docs
  *                     (the doc shares that span with enough others
  *                     that the model sees it repeatedly);
  *   - `exposed_frac`— n_exposed / n_shingles, the doc's duplication-
  *                     weighted exposure;
  *   - `max_df`      — the doc's most-duplicated shingle's document
  *                     frequency (worst single span);
  *   - `risk`        — bucketed verdict (high >= 0.5, medium >= 0.1,
  *                     low > 0, else none) for downstream routing.
  *
  * Scale shape: the inverted-index formulation — per-row shingling
  * (native expression, zero shuffle) + explode, ONE shuffle to count
  * document frequency per shingle (map-side combine), one shingle-keyed
  * join back, one doc-keyed aggregation, and a broadcast-free left join
  * to re-attach shingleless (short) documents. No pairwise term
  * anywhere: risk is a property of the df distribution, not of the
  * pair graph, so this stays linear where the near-dup joins are
  * collision-bounded. */
object MemorizationRisk {

  /** (doc_id, n_shingles, n_exposed, exposed_frac, max_df, risk) for
    * every input document — shingleless docs ride with zero counts and
    * risk 'none'. */
  def report(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Long = 3L): DataFrame = {
    require(minDocs >= 2L, s"minDocs must be >= 2, got $minDocs")
    val postings = df.select(col(idCol).as("doc_id"),
      explode(graft.expressions.TextExpressions
        .wordShingles(col(textCol), n)).as("sh"))
    // df per shingle: postings are distinct per doc, so count(*) IS the
    // distinct-document frequency — no countDistinct shuffle needed
    val dfreq = postings.groupBy(col("sh"))
      .agg(count(lit(1)).as("dfc"))
    val perDoc = postings.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("dfc") >= minDocs, 1L).otherwise(0L)).as("n_exposed"),
        max(col("dfc")).as("max_df"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_exposed"), lit(0L)).as("n_exposed"),
        coalesce(col("max_df"), lit(0L)).as("max_df"))
      .withColumn("exposed_frac",
        when(col("n_shingles") > 0,
          col("n_exposed").cast("double") / col("n_shingles"))
          .otherwise(lit(0.0)))
      .withColumn("risk",
        when(col("exposed_frac") >= 0.5, "high")
          .when(col("exposed_frac") >= 0.1, "medium")
          .when(col("exposed_frac") > 0.0, "low")
          .otherwise("none"))
      .select(col("doc_id"), col("n_shingles"), col("n_exposed"),
        col("exposed_frac"), col("max_df"), col("risk"))
  }
}
