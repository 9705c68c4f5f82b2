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
}
