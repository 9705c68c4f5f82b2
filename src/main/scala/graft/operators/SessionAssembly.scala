package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session transcript assembly — the chat-log-to-training-example step
  * of an SFT/dialogue pipeline: group an event stream into sessions
  * (the x10 gap rule), order each session by the engine-portable total
  * order (ts, event id), and render the ordered event sequence as one
  * transcript string per session, truncated to a per-example budget
  * with an explicit `truncated` flag (silently over-long examples are
  * how context overflows reach training).
  *
  * Shape at 100 TB: the two session windows are partitioned by the
  * user id (high-cardinality — the x10/x142 class, never global); the
  * per-session assembly is ONE groupBy whose collect is bounded by the
  * session, not the corpus. A runaway session (a bot firing for weeks
  * inside the gap) would make one group's collect a task-memory
  * incident, so the operator pre-counts sessions and FAILS LOUDLY past
  * `maxCollect` (the x141 maxBasketSize convention) instead of letting
  * one hot group OOM an executor; `maxEvents` then truncates the
  * rendered transcript — the output budget — independently of that
  * safety bound.
  *
  * Ordering inside a session is total: (ts, id) with the unique id as
  * the tie-break, so same-timestamp events render identically on every
  * engine and every rerun.
  *
  * Output per (user, session_idx): n_events, truncated, session_start/
  * session_end (rendered strings — the Registry timestamp convention),
  * transcript (`;`-joined event labels, first `maxEvents` in order). */
object SessionAssembly {

  def transcripts(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, labelCol: String, gapMinutes: Int,
      maxEvents: Int, maxCollect: Long = 1L << 20): DataFrame = {
    require(maxEvents > 0, s"transcripts: maxEvents must be > 0")
    require(maxCollect >= maxEvents,
      s"transcripts: maxCollect ($maxCollect) < maxEvents ($maxEvents)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000
    val sessioned = events.withColumn("__new",
        when(lag(col(tsCol), 1).over(w).isNull ||
          unix_micros(col(tsCol)) -
            unix_micros(lag(col(tsCol), 1).over(w)) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // loud hot-session guard BEFORE any collect: one groups-sized agg
    val hottest = sessioned.groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).first().getLong(0)
    require(hottest <= maxCollect,
      s"transcripts: hottest session has $hottest events > maxCollect " +
        s"$maxCollect — a runaway session would OOM its task; filter " +
        "or split it first (or raise maxCollect deliberately)")

    sessioned
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        array_sort(collect_list(struct(col(tsCol).as("t"),
          col(idCol).as("i"), col(labelCol).as("l")))).as("__ev"))
      .select(col(userCol), col("session_idx"), col("n_events"),
        (col("n_events") > maxEvents).as("truncated"),
        col("session_start"), col("session_end"),
        array_join(slice(transform(col("__ev"), e => e.getField("l")),
          1, maxEvents), ";").as("transcript"))
  }
}
