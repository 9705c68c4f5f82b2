package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable rounding of DOUBLE expressions.
  *
  * Spark's `round(x: double, k)` rounds the SHORTEST-DECIMAL
  * representation of x (`BigDecimal.valueOf` goes through
  * `Double.toString`), while DuckDB rounds the binary value — so any
  * double whose shortest representation lands on the .5·10^-k grid
  * rounds UP in Spark and (often) DOWN in DuckDB. Exact decimal and
  * dyadic-rational values land on that grid for real (the x100/x51
  * live hits, BASELINE.md rounds 8/11); `PlanAudit
  * .roundAfterDecimalCastSites` lints the registry for the class.
  *
  * The portable form is `floor(x·10^k + 0.5) / 10^k`: multiply, add,
  * floor, divide are each a single IEEE-754 operation, so two engines
  * fed the same double produce the SAME rounded value by construction —
  * no string representation anywhere. (Convention: half-up toward +∞,
  * which differs from round()'s half-away-from-zero on negative ties;
  * mirror the same floor form in the DuckDB oracle.) Where the value
  * is still an exact DECIMAL, prefer rounding the decimal itself before
  * any double cast — that is exact, not merely portable. */
object PortableMath {

  /** floor(x·10^k + 0.5) / 10^k — deterministic k-digit half-up(+∞)
    * rounding of a double, identical on any IEEE-754 engine. */
  def roundPortable(x: Column, k: Int): Column = {
    require(k >= 0 && k <= 9, s"scale $k outside 0..9")
    val p = math.pow(10, k)
    floor(x * lit(p) + lit(0.5)) / lit(p)
  }

  /** The matching DuckDB SQL fragment for [[roundPortable]]. */
  def roundPortableSql(expr: String, k: Int): String = {
    require(k >= 0 && k <= 9, s"scale $k outside 0..9")
    val p = math.pow(10, k).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }
}
