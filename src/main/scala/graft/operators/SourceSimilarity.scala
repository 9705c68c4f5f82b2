package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Semantic similarity between corpus groups (sources, domains,
  * languages): pairwise cosine between per-group MEAN embeddings — the
  * mix-design companion to lexical overlap (x60) and distributional
  * drift (x78). Two sources whose centroids sit close are near-redundant
  * in the mix; a source far from every other is the diversity it brings
  * (centroid geometry per Manning et al., IR book §14.2).
  *
  * Determinism rides [[LabelNoise.centroidComponents]]' contract:
  * components rounded to 4dp, summed as EXACT decimals
  * (order-independent), finalized at 6dp; the pair cosine is the same
  * sequential 64-fold both engines run, rounded to 4.
  *
  * Scale shape: the corpus pays one posexplode aggregation (≤
  * groups×dim rows cross the shuffle); the pair join is groups×groups
  * over a GROUPS-sized frame — index metadata, not corpus rows (the
  * x78 bounded-group-table join class). */
object SourceSimilarity {

  /** All unordered group pairs with centroid cosine:
    * (source_a, source_b, n_a, n_b, cos), source_a < source_b. */
  def centroidSimilarity(e: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    val base = e.select(col(groupCol).as("label"), col(vecCol).as("v"))
    val cents = LabelNoise.centroidComponents(base, "label", "v")
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"),
        transform(col("pc"), p => p.getField("c")).as("centroid"))
    val sizes = base.groupBy("label").agg(count(lit(1)).as("n"))
    val withN = cents.join(sizes, "label")
    val a = withN.select(col("label").as("source_a"),
      col("centroid").as("ca"), col("n").as("n_a"))
    val b = withN.select(col("label").as("source_b"),
      col("centroid").as("cb"), col("n").as("n_b"))
    def nrm(c: org.apache.spark.sql.Column) = sqrt(aggregate(
      transform(c, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x))
    val dot = aggregate(zip_with(col("ca"), col("cb"),
      (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        round(dot / (nrm(col("ca")) * nrm(col("cb"))), 4).as("cos"))
  }
}
