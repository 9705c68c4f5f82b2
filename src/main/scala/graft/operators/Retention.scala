package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream — the analytics twin of
  * [[Funnel]]: users are cohorted by the week of their FIRST event and
  * the matrix cell (cohort, k) counts how many were active in week
  * offset k — the classic retention triangle every growth dashboard
  * renders.
  *
  * Week semantics: Monday-start calendar weeks via date_trunc('week'),
  * identical in Spark and DuckDB; offsets are whole-week differences
  * (non-negative by construction — activity can't precede the first
  * event — so truncating and flooring division agree).
  *
  * Scale shape: one user-keyed min-agg (first event), one
  * (user, week) distinct over a slim two-column projection, one
  * user-keyed join to attach cohorts, one (cohort, offset) count agg,
  * and a cohort-keyed size join (cohort frame is weeks-sized — AQE
  * broadcasts it). No windows, no collects; retention is a truncating
  * BIGINT micro division.
  */
object Retention {

  /** (cohort_week, week_offset, n_active, retention_micro) — one row
    * per non-empty matrix cell; offset-0 rows carry the cohort size and
    * retention 1000000 by construction. */
  def weeklyCohorts(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val firsts = events.groupBy(col(userCol).as("u"))
      .agg(min(col(tsCol)).as("first_ts"))
      .select(col("u"),
        to_date(date_trunc("week", col("first_ts"))).as("cohort_week"))
    val active = events
      .select(col(userCol).as("u"),
        to_date(date_trunc("week", col(tsCol))).as("week"))
      .distinct()
    val sizes = firsts.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    active.join(firsts, "u")
      .withColumn("week_offset",
        expr("datediff(week, cohort_week) div 7").cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_week")
      .withColumn("retention_micro",
        expr("n_active * 1000000 div cohort_size"))
      .select(col("cohort_week").cast("string").as("cohort_week"),
        col("week_offset"), col("n_active"), col("retention_micro"))
  }
}
