package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UniMax budget allocation (Chung, Garcia, Constant et al., "UniMax:
  * Fairer and More Effective Language Sampling for Large-Scale
  * Multilingual Pretraining", ICLR 2023): split a total token budget
  * across sources by WATER-FILLING with a per-source epoch cap —
  * iterate sources smallest-first; each takes min(uniform share of the
  * remaining budget, epochCap × its size); what a capped source leaves
  * on the table redistributes to the larger sources after it. The
  * result upweights small sources to the cap without the unbounded
  * repetition temperature sampling (x48/x57's mix shape) gives them.
  *
  * Scale shape: ONE per-source count aggregation (map-side combined);
  * the allocation loop runs on the COLLECTED s-row size table — the
  * bounded-driver-reduce precedent (x52's one-row argmax): sources are
  * dozens, never corpus-sized. All allocation arithmetic is nonnegative
  * integer division (share = ⌊U / remaining⌋), so a SQL oracle replays
  * the loop exactly with a recursive CTE. */
object Unimax {

  /** Per-source allocation of `budget` whitespace-tokens with at most
    * `epochCap` passes over any source. Columns: (source, n_tokens,
    * alloc_tokens, epochs, capped); `capped` marks sources whose epoch
    * cap bound (not the uniform share) decided their allocation.
    * Sources iterate in (n_tokens, source) ascending order — the
    * UniMax schedule; ties deterministic. */
  def allocate(spark: SparkSession, df: DataFrame, sourceCol: String,
      textCol: String, budget: Long, epochCap: Int): DataFrame = {
    require(budget >= 0L, "budget must be >= 0")
    fromCounts(spark, collectCounts(df, sourceCol, textCol),
      budget, epochCap)
  }

  /** [[allocate]] with the budget as an exact fraction
    * budgetNum/budgetDen of the corpus total (integer arithmetic:
    * budget = ⌊total · num / den⌋) — one count pass serves both the
    * total and the per-source sizes. */
  def allocateFraction(spark: SparkSession, df: DataFrame,
      sourceCol: String, textCol: String, budgetNum: Long,
      budgetDen: Long, epochCap: Int): DataFrame = {
    require(budgetNum >= 0L && budgetDen >= 1L, "budget fraction invalid")
    val counts = collectCounts(df, sourceCol, textCol)
    val budget = counts.map(_._2).sum * budgetNum / budgetDen
    fromCounts(spark, counts, budget, epochCap)
  }

  private def collectCounts(df: DataFrame, sourceCol: String,
      textCol: String): Array[(String, Long)] =
    df.groupBy(col(sourceCol).as("source"))
      .agg(sum(size(split(col(textCol), " "))).as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (s, n) => (n, s) }   // smallest-first, ties by name

  private def fromCounts(spark: SparkSession,
      counts: Array[(String, Long)], budget: Long,
      epochCap: Int): DataFrame = {
    require(epochCap >= 1, "epochCap must be >= 1")
    var u = budget
    var remaining = counts.length
    val rows = counts.map { case (source, n) =>
      val share = u / remaining            // nonneg integer division
      val cap = epochCap.toLong * n
      val alloc = math.min(share, cap)
      u -= alloc
      remaining -= 1
      val epochs = BigDecimal.valueOf(alloc.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (source, n, alloc, epochs, cap < share)
    }
    import spark.implicits._
    rows.toSeq
      .toDF("source", "n_tokens", "alloc_tokens", "epochs", "capped")
  }
}
