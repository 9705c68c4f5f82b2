package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Per-group Gini concentration (Gini 1912; the rank formula per
  * Sen, "On Economic Inequality", 1973: G = (2·Σᵢ i·xᵢ)/(n·Σx) −
  * (n+1)/n over ascending ranks i) — the corpus-health question "is
  * one document / tenant / customer carrying this whole group": G = 0
  * is perfect equality, → 1 is total concentration. Monitors mix
  * health upstream of the mix designers (x98/x106): a source whose
  * token mass concentrates into a handful of documents is a crawl or
  * boilerplate artifact long before its totals drift.
  *
  * No per-row ranks are ever materialized: over the (group, value)
  * histogram, Σᵢ i·xᵢ = Σ_v v·(c_v·B_v + c_v(c_v+1)/2) with B_v the
  * rows strictly below v — so the whole statistic is one histogram
  * aggregation, one group-partitioned cumulative window over the
  * HISTOGRAM, and a per-group rollup (the x170/x144 count-table
  * shape). Rank products accumulate in DECIMAL(38,0) (exact far past
  * long range); the only floating step is the final per-group-row
  * ratio, rounded to 6dp (the x96 rule — no double is ever summed).
  * Values must be non-negative (Gini's domain) and non-null — loud.
  */
object Gini {

  private val D38 = DecimalType(38, 0)

  /** One row per group: `(group, n, total, top_share_micro, gini)`.
    * `total` must fit a long (document the bound); gini rounds to 6dp;
    * an all-zero group reports gini = 0. */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val v = when(col(valueCol).isNull || col(valueCol) < 0,
        raise_error(concat(lit(s"Gini: null/negative $valueCol: "),
          coalesce(col(valueCol).cast("string"), lit("NULL")))))
      .otherwise(col(valueCol).cast("long"))
    val hist = df.select(col(groupCol).as("__g"), v.as("__v"))
      .groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val wB = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withB = hist
      .withColumn("__b", coalesce(sum(col("__c")).over(wB), lit(0L)))
      // Σ over this value's occupants of rank·value, in closed form
      .withColumn("__ix",
        (col("__v").cast(D38) *
          (col("__c").cast(D38) * col("__b") +
            (col("__c").cast(D38) * (col("__c") + 1L)) / 2L))
          .cast(D38))
    val agg = withB.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("n"),
        sum(col("__v") * col("__c")).cast("long").as("total"),
        sum(col("__ix")).cast(D38).as("six"),
        max(col("__v")).as("mx"))
    agg.select(col("__g").as(groupCol), col("n"), col("total"),
      when(col("total") > 0L,
        expr("mx * 1000000L DIV total")).otherwise(lit(0L))
        .as("top_share_micro"),
      when(col("total") > 0L,
        round((lit(2L).cast(D38) * col("six") -
          (col("n") + 1L).cast(D38) * col("total")).cast(DoubleType) /
          (col("n").cast(DoubleType) * col("total")), 6))
        .otherwise(lit(0.0)).as("gini"))
  }
}
