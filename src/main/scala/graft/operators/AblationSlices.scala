package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested ablation subsets for scaling-law runs: a document belongs to
  * the p-fraction subset iff frac(md5(id)) < p, so a SMALLER budget is
  * BY CONSTRUCTION a subset of every larger one — the hash-threshold
  * nesting that data-scaling studies rely on (train on 1% ⊂ 2% ⊂ 5% ⊂
  * … of the corpus and fit the curve; Kaplan 2020 / Hoffmann 2022
  * methodology). Rerun/backfill-stable like every hash split here: the
  * subset of a row depends only on its id.
  *
  * frac uses the first 6 md5 hex digits (24 bits — portable: DuckDB's
  * md5 yields the identical hex, the [[Sampling.hashSplit]] contract);
  * a permille threshold p maps to the integer cutoff ⌊p·16^6/1000⌋, so
  * membership is an INTEGER compare — no float fractions anywhere.
  *
  * Scale shape: each row is assigned its MINIMAL subset by one
  * map-side when-chain (never |thresholds| copies of the corpus), then
  * ONE (bucket, source) count aggregation; the cumulative roll-up runs
  * as a window over the buckets-sized report frame, partitioned by
  * source. Rows outside the largest threshold drop out (they belong to
  * no requested subset). */
object AblationSlices {

  /** Per (permille-threshold, source) CUMULATIVE membership: (permille,
    * source, n_docs, n_tokens) — n_* count every doc of that source in
    * the p-subset, so rows for a source are monotone nondecreasing in
    * `permille` (nested inclusion made visible). `permilles` must be
    * strictly increasing, within (0, 1000]. */
  def nestedCounts(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty, "need at least one threshold")
    require(permilles == permilles.sorted && permilles.distinct == permilles,
      s"thresholds must be strictly increasing: $permilles")
    require(permilles.head > 0 && permilles.last <= 1000,
      s"thresholds are permille values in (0, 1000]: $permilles")
    import org.apache.spark.sql.expressions.Window
    val space = 1L << 24  // 16^6
    val frac = conv(substring(md5(col(idCol).cast("string")), 1, 6), 16, 10)
      .cast("long")
    // minimal containing subset per row, map-side
    val bucket = permilles.reverse.foldLeft(lit(null).cast("int")) {
      (acc, p) => when(frac < lit(p * space / 1000L), lit(p)).otherwise(acc)
    }
    val perBucket = df
      .select(col(sourceCol).as("source"), bucket.as("permille"),
        size(split(col(textCol), " ")).cast("long").as("__nt"))
      .filter(col("permille").isNotNull)
      .groupBy(col("permille"), col("source"))
      .agg(count(lit(1)).as("__d"), sum(col("__nt")).as("__t"))
    // cumulative over the buckets-sized frame: subset p contains every
    // doc whose minimal bucket <= p
    val w = Window.partitionBy(col("source")).orderBy(col("permille"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("n_docs", sum(col("__d")).over(w))
      .withColumn("n_tokens", sum(col("__t")).over(w))
      .select(col("permille").cast("long").as("permille"), col("source"),
        col("n_docs"), col("n_tokens"))
  }
}
