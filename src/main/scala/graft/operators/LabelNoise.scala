package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Label-noise candidates by class-centroid distance: vectors far (in
  * cosine) from their own label's mean embedding are likely mislabeled —
  * the classical nearest-centroid outlier screen (centroid methods per
  * Manning et al., IR book §14.2 Rocchio; distance-to-class-center as a
  * label-error signal as in Northcutt et al., "Confident Learning",
  * JAIR 2021 — rank variant).
  *
  * Determinism contract (the oracle-parity rule): class centroids are
  * computed from per-component values rounded to 4 decimals and summed
  * as EXACT DECIMALS (order-independent across partitionings), then each
  * component is finalized to `round(sum/n, 6)`. The per-vector cosine to
  * the centroid is the same sequential fold both engines run over the
  * 64-component arrays (the x05 dot-product contract), rounded to 4.
  *
  * Scale shape: the component aggregation is posexplode → groupBy
  * (label, pos) with map-side combine — at most labels×dim rows cross
  * the shuffle regardless of corpus size. Centroids broadcast back.
  * Bottom-k per label runs TWO-PHASE (per-(label, salt) window, then a
  * window over the ≤ labels×salts×k survivors): with few labels a
  * single window per label would funnel a label's entire corpus through
  * one task at 100 TB.
  */
object LabelNoise {

  private val D4 = DecimalType(18, 4)

  /** (label, pos, c): decimal-exact mean of round(component, 4). */
  def centroidComponents(e: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    e.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sum(round(col("x").cast(DoubleType), 4).cast(D4)).as("s"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"), graft.functions.PortableMath
        .roundPortable(col("s").cast(DoubleType) / col("n"), 6).as("c"))

  /** Bottom-`k` cosine-to-own-centroid vectors per label:
    * (label, rank, vec_id, cos) — rank 1 = farthest from its class. */
  def labelOutliers(e: DataFrame, idCol: String, labelCol: String,
      vecCol: String, k: Int = 5, salts: Int = 32): DataFrame = {
    require(k >= 1 && salts >= 1)
    // centroid as an ordered array, labels×1 rows, broadcast
    val cents = centroidComponents(e, labelCol, vecCol)
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"),
        transform(col("pc"), p => p.getField("c")).as("centroid"))
    val dot = aggregate(
      zip_with(col(vecCol), col("centroid"),
        (a, b) => a.cast(DoubleType) * b),
      lit(0.0), (acc, x) => acc + x)
    val nv = sqrt(aggregate(
      transform(col(vecCol), a => a.cast(DoubleType) * a.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x))
    val nc = sqrt(aggregate(
      transform(col("centroid"), a => a * a), lit(0.0), (acc, x) => acc + x))
    val scored = e.select(col(idCol).as("vec_id"),
        col(labelCol).as("label"), col(vecCol))
      .join(broadcast(cents), "label")
      .select(col("label"), col("vec_id"),
        round(dot / (nv * nc), 4).as("cos"))
    // two-phase bottom-k: never a whole label through one task
    val phase1 = scored
      .withColumn("salt", pmod(col("vec_id"), lit(salts)))
      .withColumn("r1", row_number().over(Window
        .partitionBy(col("label"), col("salt"))
        .orderBy(col("cos"), col("vec_id"))))
      .filter(col("r1") <= k)
    phase1
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("label"))
        .orderBy(col("cos"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("label"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }
}
