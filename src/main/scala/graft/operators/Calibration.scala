package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Percentile-calibrated quality filtering — the CCNet shape (Wenzek et
  * al., "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data", LREC 2020): instead of one global fixed cutoff per
  * quality signal (the Gopher rules x28 implements), thresholds are set
  * PER GROUP (per language / per source) at a chosen percentile of that
  * group's own signal distribution, so a signal whose scale shifts
  * between languages (token counts, duplicate ratios, perplexities)
  * cuts the same *fraction* everywhere rather than silently dropping
  * whole languages.
  *
  * Scale shape: one exact-percentile aggregation per group (a sort-based
  * ObjectHashAggregate over the signal columns only — column-pruned scan)
  * produces a groups×signals threshold table that is tiny by construction
  * and joins back under an explicit `broadcast()` — the corpus is never
  * shuffled. At 100 TB exact percentile's per-group state is the corpus
  * itself; pass `exact = false` to switch the SAME contract to
  * `approx_percentile` (t-digest sketch, bounded state, mergeable
  * map-side) — the production path when groups hold billions of rows.
  */
object Calibration {

  /** One calibrated rule: `signal` (any deterministic Column over the
    * input row), the percentile `pct` in (0,1) at which the group
    * threshold sits, and the keep direction — `keepAtOrAbove = true`
    * cuts the low tail (keep signal >= threshold), false cuts the high
    * tail (keep signal <= threshold). */
  final case class Rule(name: String, signal: Column, pct: Double,
      keepAtOrAbove: Boolean)

  /** Append per-rule signal, threshold, and keep columns plus an overall
    * `keep` conjunction. Output columns per rule `r`: `r.name` (the
    * signal value), `<name>_th` (the group threshold), `keep_<name>`
    * (BIGINT 0/1); plus `keep` (BIGINT, AND of all rules). Comparisons
    * round both sides to 4 decimals — the cross-engine determinism
    * contract used for every cosine/ratio in this repo. */
  def calibratedKeep(df: DataFrame, groupCol: String, rules: Seq[Rule],
      exact: Boolean = true): DataFrame = {
    require(rules.nonEmpty, "calibratedKeep needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      "rule names must be unique")
    rules.foreach(r => require(r.pct > 0 && r.pct < 1,
      s"rule ${r.name}: pct must be in (0,1), got ${r.pct}"))
    val clash = rules.flatMap(r =>
      Seq(r.name, s"${r.name}_th", s"keep_${r.name}")) :+ "keep"
    val bad = df.columns.toSeq.intersect(clash)
    require(bad.isEmpty,
      s"calibratedKeep writes ${bad.mkString(", ")} which already exist " +
        "on the input — rename or drop them first")
    val withSig = rules.foldLeft(df)((d, r) => d.withColumn(r.name, r.signal))
    val aggs = rules.map { r =>
      val p =
        if (exact) percentile(col(r.name), lit(r.pct))
        else approx_percentile(col(r.name), lit(r.pct), lit(10000))
      p.as(s"${r.name}_th")
    }
    val th = withSig.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val joined = withSig.join(broadcast(th), Seq(groupCol))
    val withKeeps = rules.foldLeft(joined) { (d, r) =>
      val sig = round(col(r.name).cast("double"), 4)
      val t = round(col(s"${r.name}_th").cast("double"), 4)
      d.withColumn(s"keep_${r.name}",
        (if (r.keepAtOrAbove) sig >= t else sig <= t).cast("long"))
    }
    withKeeps.withColumn("keep",
      rules.map(r => col(s"keep_${r.name}") === 1L)
        .reduce(_ && _).cast("long"))
  }
}
