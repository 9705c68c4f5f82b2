package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-touch conversion attribution — the standard position-based
  * attribution rule of web/marketing analytics (see e.g. Shao & Li,
  * "Data-driven multi-touch attribution models", KDD 2011, which uses
  * last-touch as the industry baseline): each conversion event credits
  * the MOST RECENT prior touch event by the same user inside a lookback
  * window, or `none` when no touch qualifies.
  *
  * One user-partitioned window pass: running `last(touch, ignoreNulls)`
  * over rows strictly before the current event (same-timestamp touches
  * sort before conversions, so an instantaneous touch→conversion still
  * attributes), then the lookback test. No self-join: the classic
  * touch×conversion range join is strictly worse — it shuffles both
  * sides and re-finds the maximum per conversion; the running-last
  * window computes it in the sort the user partition already pays for.
  *
  * Scale shape: one shuffle on the high-cardinality user key; per-user
  * frames are that user's event history (the sessionization bound).
  * Unattributed conversions carry `-1` sentinels (documented — the
  * report stays null-free for downstream counting).
  */
object Attribution {

  /** One row per conversion: `(conv_id, user, conv_ts, attributed,
    * touch_id, age_sec)`. `attributed` is the touch's type or `none`;
    * `touch_id`/`age_sec` are −1 when unattributed. */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, conversionType: String,
      touchTypes: Seq[String], lookbackSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "no touch types")
    require(!touchTypes.contains(conversionType),
      s"conversion type '$conversionType' cannot also be a touch type")
    require(lookbackSeconds > 0, "lookbackSeconds must be positive")
    val base = events
      .filter(col(typeCol) === conversionType ||
        col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(idCol).cast("long").as("id"), col(typeCol).as("ty"),
        when(col(typeCol) === conversionType, 1).otherwise(0).as("isconv"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("ts"), col("isconv"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def lastOf(c: org.apache.spark.sql.Column) =
      last(when(col("isconv") === 0, c), ignoreNulls = true).over(w)
    val scanned = base
      .withColumn("lt_us", lastOf(unix_micros(col("ts"))))
      .withColumn("lt_ty", lastOf(col("ty")))
      .withColumn("lt_id", lastOf(col("id")))
    scanned.filter(col("isconv") === 1)
      .withColumn("age_us", unix_micros(col("ts")) - col("lt_us"))
      .withColumn("hit",
        col("lt_us").isNotNull &&
          col("age_us") <= lookbackSeconds * 1000000L)
      .select(col("id").as("conv_id"), col("u").as(userCol),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("conv_ts"),
        when(col("hit"), col("lt_ty")).otherwise(lit("none"))
          .as("attributed"),
        when(col("hit"), col("lt_id")).otherwise(lit(-1L)).as("touch_id"),
        when(col("hit"), expr("age_us DIV 1000000"))
          .otherwise(lit(-1L)).as("age_sec"))
  }
}
