package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window rate ceiling — the exact answer to "what burst rate
  * does this entity actually hit", the number a rate limiter / quota /
  * capacity plan must be sized against (and [[Burstiness]]'s natural
  * companion: B says HOW arrivals clump, this says how high the clump
  * peaks). For each entity, the maximum event count in ANY trailing
  * `windowSeconds` window — exact because a sliding-window maximum is
  * always attained at an event time, so evaluating the trailing count
  * ONLY at event anchors covers every window. The RANGE frame runs
  * over integer epoch MICROSECONDS (frame [−(w·10⁶−1), 0]), so the
  * exactness claim holds at full event-time precision — flooring to
  * seconds first would let two sub-second events up to w+1 s apart
  * share a window and overstate the peak.
  *
  * Scale shape: one user-partitioned sort carries both the RANGE-frame
  * count and the per-user max; the report aggregation rides the same
  * key. Per-user frames are that user's event history. Ties: duplicate
  * timestamps all land in each other's frame (RANGE semantics), and
  * the reported anchor is the EARLIEST time the peak is attained.
  */
object RateCeiling {

  /** One row per entity: `(user, n_events, peak, peak_at)` — peak =
    * max trailing-window count, peak_at = earliest anchor achieving
    * it (rendered as a string for engine parity). */
  def slidingPeak(events: DataFrame, userCol: String, tsCol: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 1,
      s"windowSeconds must be >= 1, got $windowSeconds")
    require(windowSeconds <= Long.MaxValue / 1000000L - 1,
      s"windowSeconds overflows the microsecond frame: $windowSeconds")
    val base = events
      .select(col(userCol).as("u"), col(tsCol).as("ts"),
        expr(s"unix_micros(${tsCol})").as("us"))
      .filter(col("u").isNotNull && col("us").isNotNull)
    val wR = Window.partitionBy(col("u")).orderBy(col("us"))
      .rangeBetween(-(windowSeconds * 1000000L - 1), 0)
    val wM = Window.partitionBy(col("u"))
    base
      .withColumn("cnt", count(lit(1)).over(wR))
      .withColumn("mx", max(col("cnt")).over(wM))
      .groupBy(col("u"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        first(col("mx")).cast("long").as("peak"),
        date_format(min(when(col("cnt") === col("mx"), col("ts"))),
          "yyyy-MM-dd HH:mm:ss").as("peak_at"))
      .withColumnRenamed("u", userCol)
  }
}
