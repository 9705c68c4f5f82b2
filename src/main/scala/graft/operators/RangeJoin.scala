package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join via binning — the other join family Spark SQL
  * has no native operator for (SURVEY.md §2.3; Snowflake/DuckDB plan
  * inequality joins with specialized IEJoin/ASOF machinery).
  *
  * A naive `a JOIN b ON point BETWEEN start AND end` becomes a
  * BroadcastNestedLoopJoin (O(|a|·|b|)). Binning makes it an equi-join:
  * intervals explode into the fixed-width bins they cover, points map to
  * exactly one bin, the join runs on (keys…, bin) through the normal
  * hash-shuffle machinery, and the exact predicate filters bin-edge false
  * positives. Candidate volume = points × avg-intervals-per-bin, which
  * the caller tunes with `binWidth` (≈ typical interval length).
  */
object RangeJoin {

  /** Inclusive point-in-interval join: rows of `points` paired with every
    * row of `intervals` (same `keys`, if given) whose
    * `[startCol, endCol]` contains `pointCol`. All three columns must be
    * NON-NEGATIVE integers (cast timestamps with unix_micros / datediff
    * first) — binning uses integer DIV, since double division of large
    * int64s can misplace boundary values by one bin.
    * Each matched pair appears exactly once — a point's single bin meets
    * each covering interval in that bin only. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: String) = expr(s"CAST($c AS BIGINT) DIV $binWidth")
    val p = points.withColumn("__bin", bin(pointCol))
    val iv = intervals
      .withColumn("__bin", explode(sequence(bin(startCol), bin(endCol))))
    p.join(iv, Seq("__bin") ++ keys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Inclusive interval-overlap join: pairs where `[lStart,lEnd]` and
    * `[rStart,rEnd]` intersect (same `keys`, if given). Both sides bin;
    * a candidate pair can share SEVERAL bins, so the duplicate guard
    * keeps only the pair's first common bin — max(bin(lStart),
    * bin(rStart)) — rather than paying a dropDuplicates shuffle.
    * Same non-negative-integer contract as [[pointInInterval]]. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: String) = expr(s"CAST($c AS BIGINT) DIV $binWidth")
    val l = left.withColumn("__bin", explode(sequence(bin(lStart), bin(lEnd))))
    val r = right.withColumn("__bin", explode(sequence(bin(rStart), bin(rEnd))))
    l.join(r, Seq("__bin") ++ keys)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bin") ===
        greatest(bin(lStart), bin(rStart))) // first shared bin only
      .drop("__bin")
  }
}
