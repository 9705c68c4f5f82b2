package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** chrF pair scoring (Popović, "chrF: character n-gram F-score for
  * automatic MT evaluation", WMT 2015) over candidate document pairs —
  * the tokenization-free sibling of [[Bleu]]: where BLEU's word n-grams
  * miss morphological near-matches ("resample" vs "resampled" share no
  * unigram), character n-grams credit the shared stem. Like x128, this
  * is the verification half of pair curation: a cheap blocking stage
  * proposes pairs, chrF adjudicates them.
  *
  * Definition (paper §2, with maxN and β pinned): per n ∈ 1..maxN over
  * whitespace-stripped text, ngrP_n = clipped-overlap / |cand grams|,
  * ngrR_n = clipped-overlap / |ref grams|, F_n the harmonic mean with
  * recall weighted β=2 (chrF2, the paper's recommended setting:
  * F = (1+β²)·P·R / (β²·P + R)), and chrF the uniform average over n.
  * maxN defaults to 3 here (the paper sweeps 1..6; 3 keeps the per-pair
  * distinct-gram walk document-bounded — a documented reduction, not a
  * behavioral difference).
  *
  * Determinism contract: gram counts and clipped overlaps are exact
  * integers; P/R are truncating micro-integer divisions; F_micro =
  * 5·P·R div (4·P + R) stays in BIGINT (5·10¹² < 2⁶³) so every engine
  * computes the identical integer; chrf_micro is the truncating integer
  * mean of the F_micro's. No doubles anywhere — the score column is
  * hash-exact across engines by construction.
  *
  * Scale shape (the x128 contract): two slim id joins attach text to
  * the already-bounded candidate-pair frame; ALL gram work is per-row —
  * one native [[graft.expressions.CharGramOverlaps]] pass, O(maxN·len)
  * per pair (the HOF clip twin is O(distinct·len) ≈ O(len²) on
  * character data and kept only as the fuzz-equivalence baseline),
  * zero extra shuffles. Pair-count discipline is the candidate
  * generator's job (banded LSH / margin mining).
  */
object Chrf {

  /** HOF twin of [[graft.expressions.CharGramOverlaps]], kept for the
    * fuzz equivalence spec (the TextExpressions native-vs-HOF
    * discipline): clipped overlap Σ_{g ∈ distinct(a)} min(count_a(g),
    * count_b(g)) — symmetric (min commutes; distinct(a) covers every
    * gram with count_a > 0). O(distinct·len) per order where the
    * native is O(len); the production path below uses the native. */
  private[operators] def clipHof(a: Column, b: Column): Column =
    coalesce(
      aggregate(array_distinct(a), lit(0L),
        (acc, g) => acc +
          least(size(filter(a, x => x === g)),
            size(filter(b, x => x === g))).cast("long")),
      lit(0L))

  /** Character n-grams of a (pre-stripped) string as an array; empty
    * when the string is shorter than n (sequence() would otherwise
    * descend). 1-based substr. HOF twin input for [[clipHof]]. */
  private[operators] def charGrams(s: Column, n: Int): Column =
    when(length(s) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n))))

  /** Score each (idA, idB) candidate pair with chrF2 over n = 1..maxN.
    * Pairs where either side strips to fewer than maxN characters are
    * dropped (some gram order would be undefined). Output per pair:
    * ids, char lengths, per-order clipped overlaps and F_micro's, and
    * the final chrf_micro. */
  def scorePairs(pairs: DataFrame, docs: DataFrame, idACol: String,
      idBCol: String, idCol: String, textCol: String,
      maxN: Int = 3): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN $maxN outside the paper's 1..6")
    val txt = docs.select(col(idCol),
      regexp_replace(col(textCol), "\\s+", "").as("cs"))
    val joined = pairs.select(col(idACol), col(idBCol))
      .join(txt.select(col(idCol).as(idACol), col("cs").as("cs_a")), idACol)
      .join(txt.select(col(idCol).as(idBCol), col("cs").as("cs_b")), idBCol)
      .filter(length(col("cs_a")) >= maxN && length(col("cs_b")) >= maxN)
      .withColumn("len_a", length(col("cs_a")).cast("long"))
      .withColumn("len_b", length(col("cs_b")).cast("long"))
    val withOv = joined.withColumn("ovs",
      graft.expressions.TextExpressions.charGramOverlaps(
        col("cs_a"), col("cs_b"), maxN))
    val withOrders = (1 to maxN).foldLeft(withOv) { (df, n) =>
      df.withColumn(s"ov_$n", element_at(col("ovs"), n))
        // |grams_n| = len - n + 1 (both sides pass the >= maxN filter)
        .withColumn(s"p_$n", expr(s"ov_$n * 1000000 div (len_a - ${n - 1})"))
        .withColumn(s"r_$n", expr(s"ov_$n * 1000000 div (len_b - ${n - 1})"))
        // chrF2: (1+β²)PR / (β²P + R) with β = 2 — pure BIGINT
        .withColumn(s"f${n}_micro", expr(
          s"CASE WHEN 4 * p_$n + r_$n = 0 THEN 0L " +
            s"ELSE 5 * p_$n * r_$n div (4 * p_$n + r_$n) END"))
    }
    withOrders
      .withColumn("chrf_micro", expr(
        s"(${(1 to maxN).map(n => s"f${n}_micro").mkString(" + ")}) " +
          s"div ${maxN}"))
      .select(Seq(col(idACol), col(idBCol), col("len_a"), col("len_b")) ++
        (1 to maxN).map(n => col(s"ov_$n")) ++
        (1 to maxN).map(n => col(s"f${n}_micro")) :+
        col("chrf_micro"): _*)
  }
}
