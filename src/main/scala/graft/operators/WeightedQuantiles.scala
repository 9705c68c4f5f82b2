package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact WEIGHTED quantiles per group — "what doc-length cutoff keeps
  * 90% of each source's TOKENS" (truncation/curation planning, the
  * weighted complement of x166's per-candidate-length report): the
  * p-quantile of `valueCol` weighted by `weightCol` is the smallest
  * value whose cumulative weight reaches p of the group's total.
  *
  * Unweighted exact medians already avoid per-row windows via the
  * count-table trick (x144); the weighted form is the same
  * decomposition with SUM(weight) in place of COUNT: ONE corpus
  * (group, value) aggregation (map-side combined, shuffle sized by
  * Σ per-group value-NDV — doc lengths, scores: bounded; a continuous
  * double column must be pre-quantized by the caller, the Profiler
  * convention), a group-partitioned cumulative window over the
  * HISTOGRAM, a groups-sized totals join, then one selection
  * aggregation per requested quantile (fan-out = |pcts| literal
  * targets).
  *
  * All-integer and engine-exact: the reach test is the cross-multiplied
  * `cum · 10⁶ >= pct · total` — no division, no rounding anywhere;
  * exact while a group's total weight stays under ~9·10¹² (pre-aggregate
  * per shard past that, the x166 bound). Null/negative weights and null
  * values fail loudly per row (a null silently vanishes from SUM and
  * shifts every quantile).
  *
  * Returns (group, pct_micro, value_at, total_weight) per requested
  * quantile. A group whose total weight is 0 reports its smallest value
  * at every quantile (0 >= 0). */
object WeightedQuantiles {

  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, pctsMicro: Seq[Long]): DataFrame = {
    require(pctsMicro.nonEmpty, "weightedQuantiles: pcts must be non-empty")
    require(pctsMicro.forall(p => p > 0 && p <= 1000000L),
      s"weightedQuantiles: pcts must be micro ratios in (0, 10^6], " +
        s"got $pctsMicro")
    require(pctsMicro.distinct.size == pctsMicro.size,
      s"weightedQuantiles: duplicate pcts in $pctsMicro")
    val v = when(col(valueCol).isNull,
        raise_error(lit(s"weightedQuantiles: null $valueCol")))
      .otherwise(col(valueCol))
    val wgt = when(col(weightCol).isNull || col(weightCol) < 0,
        raise_error(lit(s"weightedQuantiles: null/negative $weightCol")))
      .otherwise(col(weightCol).cast("long"))

    import org.apache.spark.sql.expressions.Window
    val hist = df.select(col(groupCol).as("__g"), v.as("__v"),
        wgt.as("__w"))
      .groupBy(col("__g"), col("__v"))
      .agg(sum(col("__w")).as("__cw"))
    val cum = hist.withColumn("__cum", sum(col("__cw")).over(
      Window.partitionBy(col("__g")).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = cum.groupBy(col("__g")).agg(sum(col("__cw")).as("__tot"))
      .withColumnRenamed("__g", "__tg")
    cum.join(tot, col("__g") === col("__tg"))
      .withColumn("pct_micro",
        explode(array(pctsMicro.map(lit): _*)))
      .filter(col("__cum") * lit(1000000L) >=
        col("pct_micro") * col("__tot"))
      .groupBy(col("__g"), col("pct_micro"), col("__tot"))
      .agg(min(col("__v")).as("value_at"))
      .select(col("__g").as(groupCol), col("pct_micro"),
        col("value_at"), col("__tot").as("total_weight"))
  }
}
