package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Inter-arrival burstiness — the temporal-signature statistic of Goh &
  * Barabási, "Burstiness and memory in complex systems", EPL 81 (2008):
  * for each entity's gap sequence, B = (σ−μ)/(σ+μ) ∈ (−1, 1), where B
  * ≈ −1 is a metronome (σ≪μ: bots, cron), B ≈ 0 is Poisson (organic
  * arrivals), and B → 1 is extreme burst-silence alternation (attack /
  * scraper bursts, flash crowds). The behavioral-abuse complement of
  * the volume anomalies in x138: two users with identical event COUNTS
  * separate immediately on B.
  *
  * Scale shape: one user-partitioned lag window (the x10/x142
  * high-cardinality class) → integer gap seconds; then ONE aggregation
  * per user carrying n, Σg, Σg² (Σg² as DECIMAL(38,0): gaps are
  * bounded by the stream's time span, so seconds² sums stay exact
  * where micros² would overflow a long). μ and σ derive per GROUP ROW
  * from the integer sums — the only floating arithmetic is a final
  * per-row expression over exact inputs, rounded to 6dp (the x96 PMI
  * determinism argument; no double is ever summed).
  */
object Burstiness {

  private val D38 = DecimalType(38, 0)

  /** Per entity with ≥ `minGaps` gaps: `(user, n_gaps,
    * mean_gap_sec_micro, burstiness, cv)` — B and the coefficient of
    * variation rounded to 6dp; a degenerate all-zero gap sequence
    * (σ+μ = 0) reports B = 0 and cv = 0 by convention. */
  def interArrival(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, minGaps: Long = 2L): DataFrame = {
    require(minGaps >= 1, s"minGaps must be >= 1, got $minGaps")
    val w = Window.partitionBy(col("u")).orderBy(col("ts_us"), col("id"))
    val gaps = events
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).cast("long").as("id"))
      .filter(col("u").isNotNull && col("ts_us").isNotNull)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("g", expr("(ts_us - prev_us) DIV 1000000"))
    // s1 stays a LONG (bounded by the stream's time span × rows, well
    // under 2^63) so the micro mean is an exact integral divide on both
    // engines — decimal DIV rounds-then-truncates in Spark while DuckDB
    // floors, an off-by-one on x.999… quotients; only the variance
    // terms (squares) need DECIMAL(38,0)
    val agg = gaps.groupBy(col("u"))
      .agg(count(lit(1)).as("n"),
        sum(col("g")).cast("long").as("s1"),
        sum((col("g") * col("g")).cast(D38)).cast(D38).as("s2"))
      .filter(col("n") >= minGaps)
    val mu = col("s1").cast(DoubleType) / col("n")
    val vard = (col("n") * col("s2") -
      col("s1").cast(D38) * col("s1").cast(D38))
      .cast(DoubleType) / (col("n").cast(DoubleType) * col("n"))
    val sigma = sqrt(greatest(vard, lit(0.0)))
    agg.select(col("u").as(userCol), col("n").cast("long").as("n_gaps"),
      expr("CAST(s1 * 1000000 DIV n AS BIGINT)").as("mean_gap_sec_micro"),
      when(sigma + mu > 0.0, round((sigma - mu) / (sigma + mu), 6))
        .otherwise(lit(0.0)).as("burstiness"),
      when(mu > 0.0, round(sigma / mu, 6))
        .otherwise(lit(0.0)).as("cv"))
  }
}
