package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Per-group corpus cardinality report: how many distinct documents and
  * distinct word n-gram shingles each slice of the corpus contributes —
  * the dataset-card numbers (vocabulary growth, slice sizes, dedup
  * headroom) every training-data release publishes.
  *
  * Scale shape: the exact distinct-shingle count is the expensive half —
  * at 100 TB it is a full shuffle of the (group, shingle) posting set.
  * The report therefore also carries the HyperLogLog++ sketch estimate
  * (`approx_count_distinct`, Heule et al., EDBT 2013 — Spark's native
  * implementation): bounded state, map-side mergeable, no posting
  * shuffle. Here BOTH are computed — the exact value feeds the oracle,
  * and the sketch self-adjudicates against it in-query (`sketch_ok`:
  * relative error within `maxRelErr`), the x14/x61 pattern for verdicts
  * an external SQL oracle cannot recompute. Production callers at scale
  * drop the exact column and keep the sketch.
  */
object Cardinality {

  /** (group, n_docs, n_shingles, sketch_ok) per group value, where
    * `sketch_ok` asserts |HLL − exact| / exact <= maxRelErr. The HLL
    * precision is set from `rsd` (relative standard deviation, default
    * 0.05); `maxRelErr` defaults to 3× the rsd — a ±3σ band. */
  def shingleCardinality(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, n: Int = 4, rsd: Double = 0.05,
      maxRelErr: Double = 0.15): DataFrame =
    df.select(col(groupCol), col(idCol).as("__id"),
        explode(shingles(tokens(col(textCol)), n)).as("__sh"))
      .groupBy(col(groupCol))
      .agg(
        countDistinct(col("__id")).as("n_docs"),
        countDistinct(col("__sh")).as("n_shingles"),
        approx_count_distinct(col("__sh"), rsd).as("__hll"))
      .withColumn("sketch_ok",
        abs(col("__hll").cast("double") - col("n_shingles").cast("double"))
          <= lit(maxRelErr) * col("n_shingles").cast("double"))
      .drop("__hll")
}
