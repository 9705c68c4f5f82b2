package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BLEU-2 pair scoring (Papineni et al., "BLEU: a Method for Automatic
  * Evaluation of Machine Translation", ACL 2002) over candidate document
  * pairs — the verification half of pair curation: candidate pairs from
  * a cheap blocking stage (near-dup candidates, mined bitext) get a
  * modified-n-gram-precision score that, unlike raw Jaccard, is
  * occurrence-CLIPPED (a candidate repeating one shared word 50 times
  * scores its true overlap, not 50 hits) and asymmetric (candidate vs
  * reference), with the brevity penalty punishing short candidates that
  * "translate" only a fragment of the reference.
  *
  * Determinism contract: clipped counts and lengths are exact integers;
  * p1/p2 are truncating micro-integer divisions; their geometric mean is
  * an integer floor-sqrt (p1_micro·p2_micro ≤ 10^12 < 2^52, where IEEE
  * correctly-rounded sqrt + floor is exact in both engines); only the
  * brevity penalty exp(1 - r/c) goes through the x40 6dp-round double
  * discipline, and the final bleu_6 is derived from bp_6 and geo_micro
  * by the identical expression in both engines.
  *
  * Scale shape: two slim id joins attach text to the (already bounded)
  * candidate-pair frame; ALL n-gram work is per-row higher-order-function
  * composition — clip(c, r) walks the distinct candidate grams against
  * both sides, O(|distinct| · len) per pair on ~document-sized arrays,
  * zero extra shuffles. Pair-count discipline is the candidate
  * generator's job (banded LSH / margin mining), exactly as with every
  * other verify-after-blocking operator here.
  */
object Bleu {

  /** Clipped overlap: Σ_{g ∈ distinct(cand)} min(count_cand(g),
    * count_ref(g)) — modified n-gram precision's numerator. */
  private def clip(cand: Column, ref: Column): Column =
    coalesce(
      aggregate(array_distinct(cand), lit(0L),
        (acc, g) => acc +
          least(size(filter(cand, x => x === g)),
            size(filter(ref, x => x === g))).cast("long")),
      lit(0L))

  private def bigrams(ts: Column): Column =
    transform(slice(ts, lit(1), size(ts) - 1),
      (w, i) => concat_ws("_", w, element_at(ts, i + 2)))

  /** Score each (idA, idB) pair: side A is the CANDIDATE, side B the
    * REFERENCE. Pairs whose candidate has fewer than 2 tokens are
    * dropped (no bigrams — BLEU-2 is undefined). Output per pair:
    * (idA, idB, len_a, len_b, p1_micro, p2_micro, geo_micro, bp_6,
    * bleu_6). */
  def scorePairs(pairs: DataFrame, docs: DataFrame, idACol: String,
      idBCol: String, idCol: String, textCol: String): DataFrame = {
    val txt = docs.select(col(idCol), split(col(textCol), " ").as("ts"))
    val ta = col("ts_a"); val tb = col("ts_b")
    val joined = pairs.select(col(idACol), col(idBCol))
      .join(txt.select(col(idCol).as(idACol), col("ts").as("ts_a")), idACol)
      .join(txt.select(col(idCol).as(idBCol), col("ts").as("ts_b")), idBCol)
      .filter(size(ta) >= 2)
    joined
      .withColumn("len_a", size(ta).cast("long"))
      .withColumn("len_b", size(tb).cast("long"))
      .withColumn("c1", clip(ta, tb))
      .withColumn("c2", clip(bigrams(ta), bigrams(tb)))
      .withColumn("p1_micro", expr("c1 * 1000000 div len_a"))
      .withColumn("p2_micro", expr("c2 * 1000000 div (len_a - 1)"))
      .withColumn("geo_micro",
        floor(sqrt((col("p1_micro") * col("p2_micro")).cast("double")))
          .cast("long"))
      .withColumn("bp_6",
        round(exp(least(lit(0.0),
          lit(1.0) - col("len_b").cast("double") / col("len_a"))), 6))
      .withColumn("bleu_6",
        round(col("bp_6") * col("geo_micro") / 1e6, 6))
      .select(col(idACol), col(idBCol), col("len_a"), col("len_b"),
        col("p1_micro").cast("long").as("p1_micro"),
        col("p2_micro").cast("long").as("p2_micro"),
        col("geo_micro"), col("bp_6"), col("bleu_6"))
  }
}
