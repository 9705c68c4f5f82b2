package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Capture–recapture distinct-count estimation (Petersen 1896 /
  * Lincoln 1930; the bias-corrected estimator and its variance per
  * Chapman 1951 and Seber, "The Estimation of Animal Abundance", 1982
  * §3.1): two INDEPENDENT deterministic hash captures of the key
  * population — A = keys with md5('a·'+k) below a hex threshold, B
  * likewise under salt 'b·' — and the overlap estimates the total:
  *
  *   N̂ = (n_A+1)(n_B+1)/(n_AB+1) − 1,
  *   Var ≈ (n_A+1)(n_B+1)(n_A−n_AB)(n_B−n_AB) / ((n_AB+1)²(n_AB+2)).
  *
  * The sketch-free third way to count distincts: exact distinct pays a
  * full shuffle of every key, HLL (x70) pays a fixed accuracy, while
  * two captures at fraction f pay ~2f of the distinct work for a
  * standard error the report states explicitly. Each capture filters
  * FIRST (map-side, the hash decides membership), so only f of the
  * key stream reaches either distinct.
  *
  * The report carries the exact distinct as its adjudicator column
  * (the x62 guarded-baseline convention — a production run at scale
  * drops it; the estimator is the product). Integer arithmetic
  * throughout; the only floating value is the rounded standard error.
  *
  * Overflow contract: the Var numerator is a product of four counts
  * (~N⁴/64 at half-captures) and N̂'s numerator is (n_A+1)(n_B+1)
  * (~N²/4) — both silently wrap a LONG at corpus scale (N ≳ 150k per
  * capture for the former, ≳ 3·10⁹ for the latter, well inside the
  * operator's advertised regime). Each factor is therefore cast to
  * DOUBLE before the Var multiply, and N̂/err are computed in
  * DECIMAL(38,0) then narrowed to BIGINT (the quotient is ~N, which
  * always fits).
  */
object CaptureRecapture {

  /** One row: `(n_a, n_b, n_ab, n_hat, se, exact_distinct,
    * err_micro)`. `hexLt` is the capture fraction as a leading-hex
    * threshold (e.g. "4" = 4/16 of keys per capture). */
  def estimateDistinct(df: DataFrame, keyCol: String,
      hexLt: String = "4"): DataFrame = {
    require(hexLt.length == 1 && "123456789abcdef".contains(hexLt),
      s"hexLt must be one hex digit in 1..f, got '$hexLt'")
    val keys = df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
    def capture(salt: String) = keys
      .filter(substring(md5(concat(lit(s"${salt}·"), col("k"))), 1, 1)
        < hexLt)
      .distinct()
    val a = capture("a").withColumnRenamed("k", "ka")
    val b = capture("b").withColumnRenamed("k", "kb")
    val nA = a.agg(count(lit(1)).as("n_a"))
    val nB = b.agg(count(lit(1)).as("n_b"))
    val nAB = a.join(b, col("ka") === col("kb"))
      .agg(count(lit(1)).as("n_ab"))
    val exact = keys.distinct().agg(count(lit(1)).as("exact_distinct"))
    nA.crossJoin(broadcast(nB)).crossJoin(broadcast(nAB))
      .crossJoin(broadcast(exact))
      .withColumn("n_hat",
        expr("CAST(CAST(n_a + 1 AS DECIMAL(38,0)) * CAST(n_b + 1 AS " +
          "DECIMAL(38,0)) DIV (n_ab + 1) AS BIGINT) - 1"))
      .withColumn("se", round(sqrt(
        ((col("n_a") + 1L).cast(DoubleType) *
          (col("n_b") + 1L).cast(DoubleType) *
          (col("n_a") - col("n_ab")).cast(DoubleType) *
          (col("n_b") - col("n_ab")).cast(DoubleType)) /
          ((col("n_ab") + 1L).cast(DoubleType) *
            (col("n_ab") + 1L).cast(DoubleType) *
            (col("n_ab") + 2L).cast(DoubleType))), 4))
      // sign(diff) * (abs(diff) DIV d): Spark DIV truncates toward
      // zero while DuckDB // floors — they differ on inexact NEGATIVE
      // quotients (the x201 lesson), so divide magnitudes only and
      // reapply the sign (identical on both engines, mirrored in the
      // x194 oracle).
      .withColumn("err_micro",
        expr("CASE WHEN exact_distinct = 0 THEN 0L ELSE " +
          "CAST(SIGN(n_hat - exact_distinct) AS BIGINT) * " +
          "CAST(CAST(ABS(n_hat - exact_distinct) AS DECIMAL(38,0)) " +
          "* 1000000 DIV exact_distinct AS BIGINT) END"))
      .select(col("n_a"), col("n_b"), col("n_ab"), col("n_hat"),
        col("se"), col("exact_distinct"), col("err_micro"))
  }
}
