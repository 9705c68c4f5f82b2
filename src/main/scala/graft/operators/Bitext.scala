package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings"; the
  * CCMatrix/LASER curation step): candidate translation pairs between two
  * embedding sets score by the RATIO margin
  *
  *   margin(x,y) = cos(x,y) / ( Σ_{z∈NNk(x)} cos(x,z)/2k
  *                            + Σ_{z∈NNk(y)} cos(y,z)/2k )
  *
  * — raw cosine is miscalibrated across language pairs (hubness), the
  * margin normalizes by each side's local neighborhood density.
  *
  * Determinism contract: cosines are 4dp-rounded doubles ([[Similarity]]
  * convention), then everything becomes INTEGER arithmetic — cosines in
  * e4 units, the margin as `c4·2k·10^6 DIV (den_x + den_y)` micro-units
  * (nonnegative operands only, so Spark's truncating `div` and DuckDB's
  * flooring `//` agree). Candidates with c4 ≤ 0 or den ≤ 0 are dropped
  * (a negative-cosine "translation" is noise by definition).
  *
  * Scale shape: the kNN generator here is [[Similarity
  * .bruteForceTopKBroadcast]] (guarded driver-held matrix, zero joins,
  * zero lint-visible quadratic shapes) — the "small corpus, huge query
  * stream" regime. Beyond broadcast, swap the candidate generator for
  * [[Similarity.ivfTopK]] or SRP-LSH blocking ([[Dedup
  * .embeddingLshPairs]]) exactly as x05→x14/x31 do; the margin math is
  * candidate-source-agnostic (it only needs each side's top-k sums). */
object Bitext {

  /** Mine forward-best pairs x→y with ratio-margin scoring. `xs`/`ys`
    * must have disjoint id spaces (bitext sides are distinct corpora).
    * Output: (src_id, tgt_id, cos, margin_micro, is_mutual), one row per
    * src with margin ≥ `minMarginMicro`; `is_mutual` marks pairs that are
    * ALSO the target side's best (the strictest A&S strategy). */
  def mineMargin(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, minMarginMicro: Long = 1000000L): DataFrame = {
    require(k > 0, s"bad k $k")
    val fwd = Similarity.bruteForceTopKBroadcast(ys, xs, idCol, vecCol, k)
      .withColumn("c4", round(col("cos") * 10000).cast("long"))
    val bwd = Similarity.bruteForceTopKBroadcast(xs, ys, idCol, vecCol, k)
      .withColumn("c4", round(col("cos") * 10000).cast("long"))
    // per-side neighborhood-density denominators (sum of top-k cosines,
    // e4 units) — k-bounded per id, exact integers
    val denX = fwd.groupBy(col("query_id").as("src_id"))
      .agg(sum(col("c4")).as("den_x"))
    val denY = bwd.groupBy(col("query_id").as("tgt_id"))
      .agg(sum(col("c4")).as("den_y"))

    def margined(cands: DataFrame, qOut: String, nOut: String): DataFrame =
      cands.select(col("query_id").as(qOut), col("neighbor_id").as(nOut),
          col("cos"), col("c4"))
        .join(denX, Seq("src_id"))
        .join(denY, Seq("tgt_id"))
        .filter(col("c4") > 0 && col("den_x") + col("den_y") > 0)
        .withColumn("margin_micro",
          expr(s"c4 * ${2L * k} * 1000000 div (den_x + den_y)"))

    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin_micro").desc, col("tgt_id"))
    val bestFwd = margined(fwd, "src_id", "tgt_id")
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("src_id", "tgt_id", "cos", "margin_micro")
    val wB = Window.partitionBy(col("tgt_id"))
      .orderBy(col("margin_micro").desc, col("src_id"))
    val bestBwd = margined(bwd, "tgt_id", "src_id")
      .withColumn("rk", row_number().over(wB)).filter(col("rk") === 1)
      .select(col("src_id"), col("tgt_id"), lit(true).as("is_mutual"))
    bestFwd.join(bestBwd, Seq("src_id", "tgt_id"), "left")
      .withColumn("is_mutual", coalesce(col("is_mutual"), lit(false)))
      .filter(col("margin_micro") >= minMarginMicro)
  }
}
