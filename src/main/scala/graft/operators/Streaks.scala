package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-user activity streaks — the gaps-and-islands decomposition
  * (folklore SQL, written up e.g. in Ben-Gan, "Microsoft SQL Server
  * 2012 High-Performance T-SQL Using Window Functions", ch. 6): on the
  * distinct active days of a user, `day − row_number()` is CONSTANT
  * exactly across consecutive runs, so one subtraction turns streak
  * detection into a plain GROUP BY. Engagement/retention reporting's
  * workhorse (longest streak, current streak, streak counts) without
  * any self-join or iterative pass.
  *
  * Scale shape: one distinct over (user, day) — corpus-keyed, then
  * everything else is windows/aggregations partitioned by the
  * high-cardinality user key over the per-user DAY frames (each user's
  * slice is bounded by the calendar, not the event volume, so a hot
  * user cannot funnel a task). No global windows, no joins.
  */
object Streaks {

  /** One row per user: `(user, active_days, n_streaks, max_streak,
    * max_streak_start)` — the longest run of consecutive active days,
    * ties broken by the earliest start. Day boundaries are UTC dates
    * of `tsCol`; the start day renders as a string for engine parity. */
  def daily(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .filter(col("u").isNotNull && col("d").isNotNull)
      .distinct()
    val wU = Window.partitionBy(col("u")).orderBy(col("d"))
    val islands = days
      .withColumn("epoch", datediff(col("d"), lit("1970-01-01")))
      .withColumn("island", col("epoch") - row_number().over(wU))
    val streaks = islands.groupBy(col("u"), col("island"))
      .agg(count(lit(1)).cast("long").as("len"), min(col("d")).as("start"))
    // groups-sized frame: attach the per-user max, then break length
    // ties to the earliest start in one aggregation
    val withMax = streaks.withColumn("maxlen",
      max(col("len")).over(Window.partitionBy(col("u"))))
    withMax.groupBy(col("u"))
      .agg(sum(col("len")).cast("long").as("active_days"),
        count(lit(1)).cast("long").as("n_streaks"),
        first(col("maxlen")).cast("long").as("max_streak"),
        date_format(min(when(col("len") === col("maxlen"), col("start"))),
          "yyyy-MM-dd").as("max_streak_start"))
      .withColumnRenamed("u", userCol)
  }
}
