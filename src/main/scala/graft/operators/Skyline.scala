package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group 2-D skyline (Pareto frontier) — the skyline operator of
  * Börzsönyi, Kossmann & Stocker ICDE 2001: rows no other row in the
  * group dominates, where q dominates p iff q minimizes at most p's
  * cost AND maximizes at least p's benefit with one strict inequality.
  * The "cheapest-per-capability" question every catalog/config/plan
  * chooser asks.
  *
  * 2-D skylines need no quadratic dominance join: sorted by cost, a
  * point survives iff (a) no strictly-cheaper point matches its
  * benefit — a running max over a RANGE frame ending 1 below the
  * current cost — and (b) no equal-cost point strictly beats it — the
  * max over the cost tie-group. Exact duplicates don't dominate each
  * other (no strict inequality), so both survive, matching the paper's
  * definition.
  *
  * Scale shape: one group-partitioned range-frame window + one
  * (group, cost) tie-max window over the same sort — a single sort
  * pass, no self-join, no cross join. Group-partitioned windows put a
  * whole group through one task: right for many-groups frames (brands,
  * tenants, configs); a single giant group needs a cost-bucket
  * pre-split instead. Cost/benefit must be integral (cents, not
  * doubles) — the RANGE frame and the dominance comparisons are then
  * engine-exact. */
object Skyline {

  /** The frontier rows only: (group, id, cost, benefit). */
  def frontier2d(df: DataFrame, groupCol: String, idCol: String,
      costCol: String, benefitCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(costCol).cast("long").as("cost"),
      col(benefitCol).cast("long").as("benefit"))
    val cheaper = Window.partitionBy("grp").orderBy("cost")
      .rangeBetween(Window.unboundedPreceding, -1)
    val tie = Window.partitionBy("grp", "cost")
    base
      .withColumn("best_cheaper", max(col("benefit")).over(cheaper))
      .withColumn("best_tie", max(col("benefit")).over(tie))
      .filter((col("best_cheaper").isNull ||
        col("best_cheaper") < col("benefit")) &&
        col("best_tie") === col("benefit"))
      .select(col("grp").as(groupCol), col("id").as(idCol),
        col("cost"), col("benefit"))
  }
}
