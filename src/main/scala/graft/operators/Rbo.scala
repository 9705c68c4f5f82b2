package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rank-biased overlap (Webber, Moffat & Zobel, "A Similarity Measure
  * for Indefinite Rankings", TOIS 2010) — do two scorers RANK a corpus
  * the same way, asked without relevance labels: the top-weighted
  * agreement between two orderings. The eval family's missing third
  * leg: x126 scores one ranking against labeled truth, x202 asks
  * whether one ranking concentrates an outcome, RBO compares two
  * rankings against each other (old vs new quality scorer, lexical vs
  * embedding retrieval order) — the "can we swap the scorer" question
  * asked before either is deployed.
  *
  * Truncated RBO@k: with A_d/B_d the top-d sets of the two orderings,
  * X_d = |A_d ∩ B_d|, RBO = (1−p)·Σ_{d=1..k} p^{d−1}·X_d/d, p the
  * top-weight (persistence) parameter. A doc with ranks (ra, rb)
  * enters the intersection at every depth d ≥ max(ra, rb) — so the
  * whole computation reduces to the HISTOGRAM of m = max(ra, rb)
  * truncated at k: X_d = #{docs: m ≤ d}, a cumulative count over a
  * ≤ k-row frame.
  *
  * Scale shape: ranks come from [[GlobalOrder.positions]] twice (the
  * TeraSort offset decomposition — no global window), the two rank
  * relations join on the id (one corpus-keyed equi-join), and the
  * m ≤ depth filter cuts everything after to a depth-sized frame
  * (depth is required ≤ 10 000). The geometric weights p^{d−1} are
  * DRIVER-computed literals (one bounded table, broadcast) so both
  * engines sum identical decimal-rounded terms — no transcendental
  * evaluated in either engine (the x100/x51 parity lesson). Ties in
  * either key break by id, deterministically on both engines.
  *
  * Output — one row per depth 1..k: `(d, x_d, term_micro)` plus a
  * `d = −1` summary row carrying `rbo_micro` = the truncated RBO in
  * 6-dp micro units (term_micro on per-depth rows is that depth's
  * weighted contribution, also 6 dp; x_d on the summary row is X_k).
  */
object Rbo {

  /** Per-depth overlap + the d = −1 RBO summary row. `pMicro` is the
    * persistence parameter in micro units (e.g. 900000 = p 0.9). */
  def truncated(df: DataFrame, idCol: String, keyColA: String,
      keyColB: String, pMicro: Long, depth: Int,
      bucketChars: Int = 4, superChars: Int = 1): DataFrame = {
    require(depth >= 1 && depth <= 10000,
      s"depth must be in 1..10000, got $depth")
    require(pMicro > 0 && pMicro < 1000000L,
      s"pMicro must be in (0, 10^6), got $pMicro")
    val p = pMicro.toDouble / 1000000.0
    // driver-computed geometric weights: (d, (1-p)·p^(d-1)/d) rounded
    // to 10 dp — literal on both engines, so no pow() parity risk
    val weights = (1 to depth).map { d =>
      (d.toLong, BigDecimal((1 - p) * math.pow(p, d - 1) / d)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP))
    }
    val spark = df.sparkSession
    import spark.implicits._
    // wgt narrowed to decimal(12,10): the encoder's default (38,18)
    // would push (38,18)×long past precision 38 and Spark's
    // allowPrecisionLoss silently ROUNDS the product to scale 6 —
    // (12,10)×(20,0) stays exact at (33,10)
    val wTab = broadcast(weights.toDF("d", "wgt")
      .select(col("d"), col("wgt").cast(DecimalType(12, 10)).as("wgt")))
    val ra = GlobalOrder.positions(df, idCol, keyColA,
      bucketChars, superChars).select(col(idCol), col("pos").as("__ra"))
    val rb = GlobalOrder.positions(df, idCol, keyColB,
      bucketChars, superChars).select(col(idCol), col("pos").as("__rb"))
    // m = the depth where this doc enters the intersection; truncate
    // at k so everything downstream is depth-sized
    val m = ra.join(rb, Seq(idCol))
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
      .filter(col("__m") <= depth)
      .groupBy(col("__m")).agg(count(lit(1)).as("__c"))
    // X_d via the bounded triangular join (depth-sized frame — the
    // x202 cumulative class, never a global window)
    val xd = wTab.as("w")
      .join(m.as("h"), col("h.__m") <= col("w.d"), "left")
      .groupBy(col("w.d").as("d"), col("w.wgt").as("wgt"))
      .agg(coalesce(sum(col("h.__c")), lit(0L)).as("x_d"))
    val terms = xd.select(col("d"), col("x_d"),
      (col("wgt") * col("x_d")).cast(DecimalType(28, 10)).as("__t"))
    val summary = terms
      .agg(max(when(col("d") === depth, col("x_d"))).as("x_d"),
        sum(col("__t")).as("__rbo"))
      .select(lit(-1L).as("d"), col("x_d"),
        expr("CAST(floor(__rbo * 1000000) AS BIGINT)").as("term_micro"))
    terms.select(col("d"), col("x_d"),
        expr("CAST(floor(__t * 1000000) AS BIGINT)").as("term_micro"))
      .unionByName(summary)
  }
}
