package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark SQL lacks natively (SURVEY.md §2.3:
  * the reference delegates all join strategy to the warehouse; Snowflake
  * and DuckDB both ship ASOF JOIN).
  *
  * Implementation is the union+window formulation, not a range join:
  * tag both sides, union them, and for every left row take the most
  * recent preceding right payload with `last(_, ignoreNulls)` over a
  * (keys, ts) window. Cost model at scale: ONE shuffle on the join keys,
  * output exactly |left| rows — versus an inequality range join whose
  * candidate volume is data-dependent and can explode. AQE handles key
  * skew on the single shuffle.
  */
object AsOfJoin {

  /** Backward (most-recent, inclusive `rightTs <= leftTs`) as-of join.
    *
    * Returns every `left` row plus `rightPayload` columns (renamed with
    * `payloadPrefix`) from the matched right row, or NULLs when no right
    * row precedes it — i.e. a LEFT ASOF JOIN; filter the prefix columns
    * non-null for inner semantics. Ties: right rows sharing (keys, ts)
    * are broken by the greatest payload struct (deterministic).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], payloadPrefix: String = "asof_"): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val payloadStruct = struct(
      (rightTs +: rightPayload).distinct.map(c => col(c).as(c)): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType

    val r = right.select(
      (keys.map(col) :+
        col(rightTs).as("__ts") :+
        lit(0).as("__side") :+
        payloadStruct.as("__payload")): _*)
    val l = left.select(
      (left.columns.map(col).toSeq :+
        col(leftTs).as("__ts") :+
        lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__payload")): _*)

    // right rows sort before left rows at equal ts => inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__payload").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = left.columns.map(col).toSeq ++
      (rightTs +: rightPayload).distinct.map(c =>
        col(s"__match.$c").as(s"$payloadPrefix$c"))
    matched.select(out: _*)
  }

  /** Forward (earliest subsequent, inclusive `rightTs >= leftTs`) as-of
    * join: the time-mirrored twin of [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], payloadPrefix: String = "asof_"): DataFrame = {
    val negL = left.withColumn("__negts", -unix_micros(col(leftTs)))
    val negR = right.withColumn("__negts", -unix_micros(col(rightTs)))
    backward(negL, negR, keys, "__negts", "__negts",
      rightPayload = (rightTs +: rightPayload).distinct, payloadPrefix)
      .drop("__negts", s"${payloadPrefix}__negts")
  }
}
