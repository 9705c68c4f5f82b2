package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}

/** Per-group EXACT quantile normalization — the cross-source signal
  * mixer: quality scores from different sources (or different scorers —
  * x51's NB llr, x40's perplexity, x07's heuristics) live on
  * incomparable scales, so ensemble weights and mix policies compare
  * QUANTILES, not raw values (the rank-transform step of Bolstad et
  * al.'s microarray quantile normalization, Bioinformatics 2003,
  * applied per group). qnorm = rank/(n+1) with rank the 1-based
  * (score ASC, id ASC) rank within the group — uniform on (0,1),
  * deterministic, exact BIGINT micro output.
  *
  * Scale shape: NO corpus-sized per-group window (groups are sources —
  * the x83 funnel rule; x136's shardBySize two-phase rank is the same
  * discipline). Histogram decomposition instead: rank = (count of
  * strictly-smaller scores in the group, off a (group, score) HISTOGRAM
  * cumulative window) + (position within the tie class, an id window
  * over that single (group, score) slice). Windows touch only the
  * bounded histogram and tie classes. The tie window is the one spot a
  * DEGENERATE distribution (every row of a group sharing one score —
  * clipped or saturated scorers do this) would re-create the funnel the
  * decomposition exists to avoid, so tie-class size is guarded loudly:
  * a class over `maxTieClass` rows fails with an actionable error
  * instead of silently serializing a source through one task. */
object QuantileNorm {

  private val IntegralTypes = Seq(ByteType, ShortType, IntegerType, LongType)

  /** (groupCol, idCol, scoreCol, rank, qnorm_micro) for every input
    * row; rank 1..n within the group, qnorm_micro = rank·10^6 div
    * (n+1) so even rank n stays strictly below 1.
    *
    * Contracts (all loud): `scoreCol` must already be integral —
    * exact-rank semantics on fractional doubles is a modeling smell
    * (micro-round to BIGINT first), so a fractional input fails at
    * declare time instead of being silently truncated. Null scores are
    * EXCLUDED (a null has no rank; the oracle twin filters them the
    * same way). A tie class larger than `maxTieClass` fails at run time
    * — the default (2^22 rows) sorts comfortably in one task; raise it
    * only with a matching executor-memory budget. */
  def perGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, maxTieClass: Long = 1L << 22): DataFrame = {
    val dt = df.schema(scoreCol).dataType
    require(IntegralTypes.contains(dt),
      s"QuantileNorm.perGroup: scoreCol '$scoreCol' must be integral " +
        s"(BYTE/SHORT/INT/LONG), got ${dt.simpleString} — quantize " +
        "fractional scores to BIGINT micro units first")
    require(maxTieClass >= 1, s"maxTieClass must be >= 1, got $maxTieClass")
    val base = df.select(col(groupCol).as("__grp"), col(idCol).as("__id"),
        col(scoreCol).cast("long").as("__score"))
      .filter(col("__score").isNotNull)
    val hist = base.groupBy(col("__grp"), col("__score"))
      .agg(count(lit(1)).as("__c"))
    val wH = Window.partitionBy(col("__grp")).orderBy(col("__score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the guard rides the histogram (one row per tie class, already
    // aggregated) inside a column the plan keeps, so pruning can't
    // silently drop it
    val classes = hist
      .withColumn("__before",
        when(col("__c") > maxTieClass, raise_error(concat(
          lit("QuantileNorm.perGroup: tie class of "), col("__c"),
          lit(s" rows (> maxTieClass $maxTieClass) at score "),
          col("__score"), lit(" in group '"),
          col("__grp").cast("string"),
          lit("' — a degenerate score distribution would funnel the " +
            "group through one task; spread the score (finer " +
            "quantization) or raise maxTieClass deliberately")))
          .cast("long"))
        .otherwise(coalesce(sum(col("__c")).over(wH), lit(0L))))
    val sizes = hist.groupBy(col("__grp")).agg(sum(col("__c")).as("__n"))
    val wT = Window.partitionBy(col("__grp"), col("__score"))
      .orderBy(col("__id"))
    base
      .join(classes.select("__grp", "__score", "__before"),
        Seq("__grp", "__score"))
      .join(sizes, Seq("__grp"))
      .withColumn("rank",
        col("__before") + row_number().over(wT).cast("long"))
      .withColumn("qnorm_micro",
        expr("rank * 1000000 div (__n + 1)"))
      .select(col("__grp").as(groupCol), col("__id").as(idCol),
        col("__score").as(scoreCol), col("rank"), col("qnorm_micro"))
  }
}
