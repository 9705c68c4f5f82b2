package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM change-point monitoring (Page, "Continuous Inspection
  * Schemes", Biometrika 1954) — the sequential statistic that catches a
  * sustained small SHIFT in a daily series long before any single-day
  * z-score (x138) fires: S_t = max(0, S_{t−1} + (x_t − k)) accumulates
  * drift above the reference level k and resets on evidence against.
  *
  * The recurrence looks inherently sequential, but the classical
  * expansion S_t = C_t − min_{0≤j≤t} C_j (C = prefix sums of x−k,
  * C_0 = 0) is the prefix-min identity this repo already uses for the
  * clamped balance (x150) — so the whole scheme is two windows over
  * the DAILY series: one cumulative sum, one running min, both
  * group-partitioned over calendar-bounded frames. The reference level
  * is the group's own mean daily volume (integer DIV — the no-drift
  * null), and the alarm threshold is `hMult × max(k, 1)`, the
  * "h = multiple of the reference" convention of SPC practice.
  *
  * Pure integer arithmetic end to end; daily counts come from one
  * corpus aggregation, everything after is groups×days-sized.
  */
object Cusum {

  /** Per (group, day): `(grp, day, x, k, cusum, flagged)` — x the
    * daily count, k the group's mean daily volume, cusum the one-sided
    * upward statistic, flagged ⟺ cusum ≥ hMult·max(k,1). */
  def dailyUpward(events: DataFrame, groupCol: String, tsCol: String,
      hMult: Long = 3L): DataFrame = {
    require(hMult >= 1, s"hMult must be >= 1, got $hMult")
    val daily = events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), to_date(col(tsCol)).as("d"))
      .agg(count(lit(1)).as("x"))
    val means = daily.groupBy(col("grp"))
      .agg(expr("sum(x) DIV count(1)").as("k"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(means), Seq("grp"))
      .withColumn("c", sum(col("x") - col("k")).over(wCum))
      .withColumn("cusum", col("c") - least(lit(0L), min(col("c")).over(wCum)))
      .select(col("grp").as(groupCol), date_format(col("d"), "yyyy-MM-dd")
          .as("day"), col("x"), col("k"),
        col("cusum"),
        (col("cusum") >= lit(hMult) * greatest(col("k"), lit(1L)))
          .as("flagged"))
  }
}
