package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level reconciliation of two snapshots of a keyed relation — the
  * Spark-native analogue of dbt audit_helper's `compare_relations` /
  * `compare_row_counts` (dbt-labs/dbt-audit-helper, public), the query
  * every migration/backfill/engine-swap signs off with: "same keys,
  * same values, and if not, WHICH rows and WHICH columns".
  *
  * Shape at 100 TB: ONE co-partitioned full-outer shuffle join on the
  * key (both sides hash-partition by the same key, AQE handles skew);
  * every per-column comparison is a codegen'd null-safe equality in the
  * join's projection — no windows, no collects, no second pass. The
  * output is bounded by the DISAGREEMENT (identical rows are dropped by
  * default), which is the quantity a reconciliation report is sized by.
  *
  * Per non-identical row: the key, a status
  * (`added` = only in right, `removed` = only in left, `changed`), and
  * `changed_cols` — the comma-joined (left-schema-ordered) list of
  * compared columns whose values differ under null-safe comparison
  * (IS DISTINCT FROM semantics: null vs value counts as a change,
  * null vs null does not).
  *
  * Contracts: both sides must share the exact column set (validated up
  * front — a schema drift is a finding the caller must acknowledge by
  * projecting, not something to silently intersect away) and keys must
  * be non-null (validated loudly per row, map-side — Spark equi-joins
  * drop null keys silently, which would report a spurious
  * added+removed pair). Key UNIQUENESS is the caller's contract, not
  * re-verified here (it would cost a full extra aggregation pass per
  * side on a join-shaped op) — a duplicate key fans the join out and
  * double-reports; audit first via [[KeyCandidates]].
  */
object RelationDiff {

  def diff(left: DataFrame, right: DataFrame, keys: Seq[String],
      dropIdentical: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "relationDiff: keys must be non-empty")
    val lCols = left.columns.toSeq
    require(lCols.toSet == right.columns.toSet,
      s"relationDiff: column sets differ — left has ${lCols.sorted}, " +
        s"right has ${right.columns.sorted.toSeq}; project both sides " +
        "to the shared contract first")
    require(keys.forall(lCols.contains),
      s"relationDiff: keys $keys not all present in ${lCols.sorted}")
    val compare = lCols.filterNot(keys.contains)
    require(compare.nonEmpty,
      "relationDiff: no non-key columns to compare")

    // loud null-key guard, map-side (a null key silently vanishes from
    // the equi-join and would surface as a phantom added+removed pair)
    def guarded(df: DataFrame, side: String): DataFrame =
      keys.foldLeft(df) { (d, k) =>
        d.withColumn(k, when(col(k).isNull,
            raise_error(lit(s"relationDiff: null key '$k' on $side side")))
          .otherwise(col(k)))
      }

    val l = guarded(left, "left").select(
      keys.map(col) ++ compare.map(c => col(c).as(s"__l_$c")) :+
        lit(1).as("__in_l"): _*)
    val r = guarded(right, "right").select(
      keys.map(col) ++ compare.map(c => col(c).as(s"__r_$c")) :+
        lit(1).as("__in_r"): _*)

    val joined = l.join(r, keys, "full_outer")
    val status = when(col("__in_r").isNull, "removed")
      .when(col("__in_l").isNull, "added")
      .when(compare.map(c => !(col(s"__l_$c") <=> col(s"__r_$c")))
        .reduce(_ || _), "changed")
      .otherwise("identical")
    // left-schema column order; concat_ws skips the NULL (unchanged)
    // slots in both Spark and DuckDB
    val changedCols = concat_ws(",", compare.map(c =>
      when(col("__status") === "changed" &&
        !(col(s"__l_$c") <=> col(s"__r_$c")), c)): _*)
    val out = joined.withColumn("__status", status)
      .withColumn("changed_cols", changedCols)
      .select(keys.map(col) :+ col("__status").as("status") :+
        col("changed_cols"): _*)
    if (dropIdentical) out.filter(col("status") =!= "identical") else out
  }

  /** The one-row sign-off summary over a [[diff]] result (run with
    * `dropIdentical = false` to get a true identical count): counts per
    * status — the audit_helper `compare_relations` top line. */
  def summary(d: DataFrame): DataFrame =
    d.agg(
      sum(when(col("status") === "identical", 1L).otherwise(0L))
        .as("n_identical"),
      sum(when(col("status") === "changed", 1L).otherwise(0L))
        .as("n_changed"),
      sum(when(col("status") === "added", 1L).otherwise(0L))
        .as("n_added"),
      sum(when(col("status") === "removed", 1L).otherwise(0L))
        .as("n_removed"))
}
