package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-key discovery — the uniqueness audit behind every merge
  * key, dedup key, and join-cardinality assumption: for each proposed
  * column set, is it actually a key? A column set is a key iff no row
  * has a null in any of its columns AND every tuple value is distinct
  * — the unique + not_null test pair (the engine's GenericTests) asked
  * as one profiling report over many candidates at once, with the
  * evidence (`max_dup`, null counts) instead of a bare pass/fail.
  *
  * Scale shape: per candidate, ONE tuple-keyed count aggregation over
  * the non-null rows (map-side combined — the same shuffle exact NDV
  * always costs) collapsed to a single stats row; the table row count
  * is one bounded count action shared by all candidates. Candidate
  * results union to a candidates-sized frame. No windows, no joins, no
  * cross joins. A `max_dup` of 1 with missing rows means "unique but
  * nullable" — the FK-shaped near-miss the report makes visible. */
object KeyCandidates {

  /** (candidate, n_rows, n_nonnull, n_distinct, max_dup, is_key) —
    * one row per candidate column set, named "a+b+c". */
  def audit(df: DataFrame, candidates: Seq[Seq[String]]): DataFrame = {
    require(candidates.nonEmpty, "no candidates")
    require(candidates.forall(_.nonEmpty), s"empty candidate in $candidates")
    val names = candidates.map(_.mkString("+"))
    require(names.distinct.size == names.size,
      s"duplicate candidates $names")
    val nRows = df.count()
    candidates.map { cols =>
      val anyNull = cols.map(col(_).isNull).reduce(_ || _)
      df.filter(!anyNull)
        .groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_distinct"),
          coalesce(sum(col("c")), lit(0L)).as("n_nonnull"),
          coalesce(max(col("c")), lit(0L)).as("max_dup"))
        .select(lit(cols.mkString("+")).as("candidate"),
          lit(nRows).as("n_rows"), col("n_nonnull"), col("n_distinct"),
          col("max_dup"),
          (col("n_nonnull") === nRows && col("max_dup") === 1L)
            .as("is_key"))
    }.reduce(_ unionByName _)
  }
}
