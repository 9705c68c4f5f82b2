package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generic data-test family (SURVEY.md §2.5 A4/A5, §2.3 J3 +
  * `accepted_values`). Each builds a *violations* DataFrame — nonzero
  * rows means the test fails, exactly the reference's compiled-test
  * contract (`models/example/schema.yml`).
  */
object GenericTests {

  /** `unique`: values appearing more than once (NULLs don't violate —
    * matches dbt/Snowflake semantics, FIXTURES.md A3). */
  def unique(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull)
      .groupBy(col(column)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** `not_null`: rows where the column is NULL. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** `accepted_values`: non-NULL values outside the allowed set. */
  def acceptedValues(df: DataFrame, column: String, values: Seq[Any]): DataFrame =
    df.filter(col(column).isNotNull && !col(column).isin(values: _*))

  /** `relationships`: child FK values with no matching parent PK
    * (left anti join — distributed, no collect). */
  def relationships(child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")

  // ---- dbt_utils test family (declared package surface, SURVEY §2.10) --

  /** `dbt_utils.unique_combination_of_columns`: duplicate key tuples. */
  def uniqueCombination(df: DataFrame, columns: Seq[String]): DataFrame =
    df.groupBy(columns.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** `dbt_utils.expression_is_true`: rows where the SQL expression is not
    * satisfied (NULL counts as a violation — dbt's compiled
    * `where not(expr)` keeps NULLs out, but silently passing NULLs hides
    * broken data, so we flag them). */
  def expressionIsTrue(df: DataFrame, sqlExpr: String): DataFrame =
    df.filter(!coalesce(expr(sqlExpr), lit(false)))

  /** `dbt_utils.equal_rowcount`: one violation row when counts differ. */
  def equalRowcount(a: DataFrame, b: DataFrame): DataFrame =
    a.agg(count(lit(1)).as("a_rows"))
      .crossJoin(b.agg(count(lit(1)).as("b_rows")))
      .filter(col("a_rows") =!= col("b_rows"))

  /** `dbt_utils.fewer_rows_than`: violation when df has >= other's rows. */
  def fewerRowsThan(df: DataFrame, other: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("a_rows"))
      .crossJoin(other.agg(count(lit(1)).as("b_rows")))
      .filter(col("a_rows") >= col("b_rows"))

  /** `dbt_utils.at_least_one`: violation when no non-NULL value exists. */
  def atLeastOne(df: DataFrame, column: String): DataFrame =
    df.agg(count(col(column)).as("n_non_null"))
      .filter(col("n_non_null") === 0)

  /** `dbt_utils.not_constant`: violation when the column never varies. */
  def notConstant(df: DataFrame, column: String): DataFrame =
    df.agg(countDistinct(col(column)).as("n_distinct"))
      .filter(col("n_distinct") <= 1)

  /** `dbt_utils.accepted_range`: non-NULL values outside [lo, hi]. */
  def acceptedRange(df: DataFrame, column: String,
      lo: Any, hi: Any): DataFrame =
    df.filter(col(column).isNotNull &&
      (col(column) < lit(lo) || col(column) > lit(hi)))

  /** `dbt_utils.not_null_proportion`: violation when the non-NULL share
    * falls below `atLeast`. */
  def notNullProportion(df: DataFrame, column: String,
      atLeast: Double): DataFrame =
    df.agg((count(col(column)).cast("double") / count(lit(1)))
        .as("non_null_share"))
      .filter(col("non_null_share") < atLeast)

  /** `dbt_utils.recency`: violation when no row's `tsCol` is at or after
    * `notBefore` (injected, not wall-clock — determinism). */
  def recency(df: DataFrame, tsCol: String,
      notBefore: java.sql.Timestamp): DataFrame =
    df.agg(max(col(tsCol)).as("latest"))
      .filter(col("latest").isNull || col("latest") < lit(notBefore))
}
