package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * perplexity-proxy quality signal (Wenzek et al., "CCNet", LREC 2020
  * rank web text by LM perplexity; at pipeline scale the same ordering
  * signal comes from a corpus-trained bigram model rather than an
  * external KenLM binary): each document scores the average negative
  * log-likelihood of its token bigrams under add-one-smoothed corpus
  * statistics,
  *
  *   lp(w2|w1) = ln((c(w1,w2) + 1) / (c(w1) + V))
  *
  * where c(·) are corpus counts and V the vocabulary size. High avg_nll
  * = improbable token sequences (gibberish, boilerplate soup); low =
  * fluent/templated text. Downstream filtering drops the tails.
  *
  * Scale shape: ONE tokenize produces the per-doc bigram stream
  * (zero-shuffle per-row array transform, PERSISTED — it feeds both the
  * bigram-count aggregation and the scoring join); unigram and bigram
  * counts are hash aggregations with map-side combine; the count tables
  * join back on their own keys (vocab-sized — AQE broadcasts them when
  * they fit); V rides a single-row broadcast. Per-bigram log-probs are
  * rounded then summed as exact decimals, so the per-doc average is
  * independent of summation order — the oracle-parity rule for float
  * aggregation (Registry scaladoc). Documents with fewer than two
  * tokens have no bigrams and drop out of the result.
  *
  * Cache residency: the returned plan READS the persisted `uni`/`bg`
  * tables, so they cannot be unpersisted before the caller's action
  * (eager materialization here would truncate the plan the ScaleSpec
  * shuffle lint audits). The residency is the price of tokenizing the
  * corpus once instead of twice (`uni` is vocab-sized; `bg` is the
  * bigram stream, MEMORY_AND_DISK so it spills rather than evicts);
  * long-lived sessions reclaim it with `spark.catalog.clearCache()`
  * between pipeline stages, batch runs at session stop.
  */
object LmScore {

  /** (doc_id, n_bigrams, avg_nll) per document with >= 1 bigram.
    *
    * Pass a [[CacheScope]] to bound the `uni`/`bg` residency to the
    * caller's action instead of the session lifetime. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
      scoreScale: Int = 4, scope: Option[CacheScope] = None): DataFrame = {
    val D6 = DecimalType(18, 6)
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("ts"))
    // persisted: consumed by BOTH the vocabulary-size count and the
    // scoring join — unpersisted, the corpus would tokenize+aggregate
    // twice (the table itself is vocab-sized, cheap to hold)
    val uni = CacheScope.route(scope, toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1")))
    val vsz = uni.agg(count(lit(1)).as("vsz"))
    val bg = CacheScope.route(scope, toks.select(col("doc_id"),
      explode(transform(slice(col("ts"), lit(1), size(col("ts")) - 1),
        (w, i) => struct(w.as("w1"),
          element_at(col("ts"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2")))
    val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    bg.join(bi, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .crossJoin(broadcast(vsz))
      .withColumn("lp", round(log((col("c2") + lit(1.0)) /
        (col("c1") + col("vsz"))), 6).cast(D6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-(sum(col("lp")).cast(DoubleType) / count(lit(1))), scoreScale)
          .as("avg_nll"))
  }
}
