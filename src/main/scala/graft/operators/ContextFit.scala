package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-length planning report: what a candidate training context
  * length costs in truncated tokens (truncate-to-fit) and in chunk
  * count (split-to-fit), per group.
  *
  * The question every pretraining-data pipeline answers before fixing
  * its sequence length ("how much of the corpus do we lose at 2k vs
  * 8k? how many sequences does split-to-fit produce?") is a pure
  * aggregation over per-document token counts — yet it is usually
  * answered by sampling because the naive form re-tokenizes per
  * candidate length. This operator takes the token count as an input
  * column (tokenize ONCE — the x08 counters or a real tokenizer
  * upstream) and fans each doc out only to the |contexts| candidate
  * lengths (a literal array, fan-out 3-5, never a join), so the whole
  * report is one map-side-combined aggregation regardless of corpus
  * size: the 100 TB cost is one scan of (group, tokens).
  *
  * Per (group, context length):
  *   - n_docs, n_docs_over (docs longer than the context),
  *   - tokens_total, tokens_truncated = Σ max(tokens − L, 0)
  *     (the loss under truncate-to-fit),
  *   - retained_micro = 10⁶·(total − truncated) DIV total (truncating
  *     BIGINT micro ratio; exact while tokens_total < ~9·10¹² per
  *     group×context — beyond that pre-aggregate per shard),
  *   - n_chunks = Σ ceil(tokens/L) as (tokens + L − 1) DIV L (the
  *     sequence count under split-to-fit; ceil via the add-before-div
  *     identity, exact in BIGINT).
  *
  * Zero windows, zero joins; integer-only arithmetic so the report is
  * hash-exact against any ANSI engine. Token counts must be
  * non-negative and non-null — validated loudly (a null count would
  * silently vanish from SUM and understate the corpus).
  */
object ContextFit {

  def report(docs: DataFrame, groupCol: String, tokenCol: String,
      contexts: Seq[Long]): DataFrame = {
    require(contexts.nonEmpty, "contextFit: contexts must be non-empty")
    require(contexts.forall(_ > 0),
      s"contextFit: context lengths must be positive, got $contexts")
    require(contexts.distinct.size == contexts.size,
      s"contextFit: duplicate context lengths in $contexts")
    // loud per-row validation: fail on null/negative token counts
    // instead of silently dropping them from the sums
    val tok = when(col(tokenCol).isNull || col(tokenCol) < 0,
        raise_error(concat(lit(s"contextFit: $tokenCol is null/negative "),
          lit("for group "), col(groupCol).cast("string"))))
      .otherwise(col(tokenCol).cast("long"))
    docs.select(col(groupCol).as("grp"), tok.as("tok"))
      .withColumn("ctx", explode(array(contexts.map(lit): _*)))
      .groupBy(col("grp"), col("ctx"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("tok") > col("ctx"), 1L).otherwise(0L))
          .as("n_docs_over"),
        sum(col("tok")).as("tokens_total"),
        sum(greatest(col("tok") - col("ctx"), lit(0L)))
          .as("tokens_truncated"),
        sum(expr("(tok + ctx - 1) DIV ctx")).as("n_chunks"))
      .withColumn("retained_micro",
        // an all-empty group (total 0) loses nothing; guarding here keeps
        // Spark (null on DIV 0) and ANSI engines (error) in agreement
        expr("CASE WHEN tokens_total = 0 THEN 1000000 ELSE " +
          "((tokens_total - tokens_truncated) * 1000000)" +
          " DIV tokens_total END"))
      .select(col("grp").as(groupCol), col("ctx"), col("n_docs"),
        col("n_docs_over"), col("tokens_total"), col("tokens_truncated"),
        col("retained_micro"), col("n_chunks"))
  }
}
