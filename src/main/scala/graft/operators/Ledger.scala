package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Floor-clamped running balance per account — the inventory/credit
  * ledger recurrence b_t = max(0, b_{t-1} + delta_t), the one that
  * looks sequential (each step depends on the clamped previous step)
  * and therefore "impossible in SQL". It isn't: once the balance
  * clamps, history before the clamp is forgotten, so with prefix sums
  * P_t the balance is
  *
  *   b_t = P_t - min(0, min_{k<=t} P_k)
  *
  * — the running minimum IS the memory of the deepest clamp. Two
  * cumulative windows over ONE account-partitioned sort (prefix sum +
  * prefix min), no recursion, no sequential scan, no UDAF state.
  *
  * The per-account summary reports the final and peak balance, the
  * clamp count (attempts to draw below zero — each is an unfilled
  * order / an overdraft event, the ops signal), and the total unmet
  * draw (how much demand the clamps swallowed). All arithmetic BIGINT.
  *
  * Scale shape: one corpus window pass partitioned by the account key
  * (high-cardinality — never global) + one account-keyed summary agg.
  * Ordering must be a caller-supplied TOTAL order (ts plus tie-breaks)
  * or clamp positions are engine-dependent. */
object Ledger {

  /** Per account: (account, n_moves, final_balance, peak_balance,
    * n_clamps, unmet_draw). */
  def clampedBalanceSummary(moves: DataFrame, accountCol: String,
      deltaCol: String, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need a total order")
    val w = Window.partitionBy("acct")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = moves.select((col(accountCol).as("acct") +:
      col(deltaCol).cast("long").as("delta") +:
      orderCols.map(col)): _*)
    base
      .withColumn("p", sum(col("delta")).over(w))
      .withColumn("floor", least(lit(0L), min(col("p")).over(w)))
      .withColumn("bal", col("p") - col("floor"))
      // a clamp fired here iff this row pushed the running min deeper
      // below zero: the would-be balance (against the PREVIOUS floor)
      // went negative, and the shortfall is how much went unmet
      .withColumn("prev_floor",
        least(lit(0L), coalesce(lag(col("floor"), 1)
          .over(Window.partitionBy("acct")
            .orderBy(orderCols.map(col): _*)), lit(0L))))
      .withColumn("short", greatest(lit(0L),
        col("prev_floor") - col("p")))
      .groupBy(col("acct").as(accountCol))
      // final balance needs no "last row": b_end = P_end - floor_end =
      // sum(delta) - min(0, min P) — order-independent aggregates only
      .agg(count(lit(1)).as("n_moves"),
        (sum(col("delta")) - least(lit(0L), min(col("p"))))
          .as("final_balance"),
        max(col("bal")).as("peak_balance"),
        sum((col("short") > 0).cast("long")).as("n_clamps"),
        sum(col("short")).as("unmet_draw"))
  }
}
