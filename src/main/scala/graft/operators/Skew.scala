package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin`, on by default) is the first line of
  * defense; explicit salting is for the cases AQE can't split — e.g. a
  * single hot key inside one aggregation, or a build side that must stay
  * a shuffled-hash join.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, with the left side's hot keys
    * spread over `factor` salted sub-keys and the right side replicated
    * `factor` times. Use when `left` is large with skewed `key` and
    * `right` is too big to broadcast but small enough to replicate.
    * Result equals `left.join(right, key)` exactly.
    *
    * The left salt must be DETERMINISTIC per row (here: hash of all left
    * columns mod factor) — a rand() salt breaks task retries at scale.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor > 1, "factor must be > 1")
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(factor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. For aggregates where Spark's own
    * map-side partial combine already bounds hot-key volume this is
    * unnecessary; use it for ObjectHashAggregate-class functions
    * (collect_list/sketches) whose partials don't shrink. */
  def twoPhaseAgg(df: DataFrame, key: String, factor: Int,
      partial: Seq[(String, String)], // (inputCol, aggFn) for phase 1
      finalAgg: Seq[(String, String)]): DataFrame = {
    require(factor > 1, "factor must be > 1")
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(factor)))
    val p1 = salted.groupBy(col(key), col("__salt"))
      .agg(expr(s"${partial.head._2}(${partial.head._1}) AS __p0"),
        partial.tail.zipWithIndex.map { case ((c, f), i) =>
          expr(s"$f($c) AS __p${i + 1}")
        }: _*)
    p1.groupBy(col(key))
      .agg(expr(s"${finalAgg.head._2}(__p0) AS ${finalAgg.head._1}"),
        finalAgg.tail.zipWithIndex.map { case ((name, f), i) =>
          expr(s"$f(__p${i + 1}) AS $name")
        }: _*)
      .drop("__salt")
  }
}
