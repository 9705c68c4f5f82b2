package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-proportion experiment readout — the controlled-experiment
  * question (Kohavi et al., "Controlled experiments on the web", KDD
  * 2007): per metric event type, did the treatment arm convert users
  * at a different rate than control, beyond z standard errors of the
  * pooled proportion? Conversion is user-level (a user converts on a
  * metric iff they fire >= 1 such event), so event-count skew from one
  * chatty user can't move the test.
  *
  * The pooled two-proportion z-test multiplies through by every
  * denominator so the verdict is EXACT arithmetic (the x138
  * discipline): with x1/n1, x2/n2 conversions over arm sizes and
  * N = n1 + n2,
  *
  *   (x1*n2 - x2*n1)^2 * N  >  z^2 * (x1+x2) * (N-x1-x2) * n1 * n2
  *
  * — engine-exact significance flags, no doubles. Intermediates run in
  * DECIMAL(38,0), exact to ~3.5e7 users per arm in the worst case
  * (x1=n1, x2=0); a derived precheck on the collected arm sizes fails
  * loudly with the actual bound before any silent wrap could occur.
  *
  * Scale shape: one (user, arm) distinct for arm sizes (a bounded
  * 2-row collect — driver literals, no crossJoin), one (metric, user,
  * arm) distinct -> per-metric conditional-count agg. No windows, no
  * joins beyond the aggregations. */
object AbTest {

  private val Dec38Max = BigInt(10).pow(38) - 1

  /** Worst-case magnitude of any intermediate term of the cleared-
    * denominator z-test; both sides are maximized at x1=n1, x2=0
    * (LHS = (n1*n2)^2 * N) and x1+x2=N/2 (RHS = z^2 * N^2/4 * n1*n2).
    * Fails loudly if either can exceed DECIMAL(38,0). */
  private[operators] def requireExact(n1: Long, n2: Long, z: Int): Unit = {
    val bigN = BigInt(n1) + BigInt(n2)
    val lhs = (BigInt(n1) * BigInt(n2)).pow(2) * bigN
    val rhs = BigInt(z) * z * bigN.pow(2) / 4 * n1 * n2
    require(lhs.max(rhs) <= Dec38Max,
      s"arm sizes control=$n1, treatment=$n2 can overflow the exact " +
        s"DECIMAL(38,0) z-test terms (worst ${lhs.max(rhs)} > 10^38-1); " +
        "at this scale a fixed-z test is degenerate — compare the " +
        "share_*_micro columns directly")
  }

  /** (metric, n_control, x_control, n_treat, x_treat,
    * share_control_micro, share_treat_micro, diff_micro, significant).
    * `treatCol` must be boolean and null-free: false = control,
    * true = treatment; a null assignment is an instrumentation bug and
    * fails loudly rather than becoming a silent third arm. */
  def conversionReport(events: DataFrame, userCol: String,
      treatCol: String, metricCol: String, z: Int = 2): DataFrame = {
    require(z >= 1, s"bad z $z")
    val users = events
      .select(col(userCol).as("u"), col(treatCol).as("t")).distinct()
    val sized = users.groupBy("t").agg(count(lit(1)).as("n")).collect()
    require(sized.forall(!_.isNullAt(0)),
      s"treatment column '$treatCol' contains nulls: every event must " +
        "carry an explicit control(false)/treatment(true) assignment")
    val sizes = sized.map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val (n1, n2) = (sizes.getOrElse(false, 0L), sizes.getOrElse(true, 0L))
    require(n1 > 0 && n2 > 0,
      s"both arms must be non-empty (control=$n1, treatment=$n2)")
    requireExact(n1, n2, z)
    // DECIMAL(38,0) intermediates: exact integer products far past the
    // BIGINT ceiling; the precheck above guarantees no 38-digit overflow.
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def decL(v: Long) = dec(lit(v))
    val (dx1, dx2) = (dec(col("x1")), dec(col("x2")))
    val diff = dx1 * decL(n2) - dx2 * decL(n1)
    events
      .select(col(metricCol).as("metric"), col(userCol).as("u"),
        col(treatCol).as("t"))
      .distinct()
      .groupBy("metric")
      .agg(sum((!col("t")).cast("long")).as("x1"),
        sum(col("t").cast("long")).as("x2"))
      .select(col("metric"), lit(n1).as("n_control"),
        col("x1").as("x_control"), lit(n2).as("n_treat"),
        col("x2").as("x_treat"),
        expr(s"x1 * 1000000 div ${n1}L").as("share_control_micro"),
        expr(s"x2 * 1000000 div ${n2}L").as("share_treat_micro"),
        expr(s"x2 * 1000000 div ${n2}L - x1 * 1000000 div ${n1}L")
          .as("diff_micro"),
        (diff * diff * decL(n1 + n2) >
          decL(z.toLong * z) * (dx1 + dx2) *
            (decL(n1 + n2) - dx1 - dx2) * decL(n1) * decL(n2))
          .as("significant"))
  }
}
