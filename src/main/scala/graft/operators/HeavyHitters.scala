package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.SketchExpressions

/** Heavy-hitters report: the exact top-k terms of a corpus column,
  * each self-adjudicated against the bounded-state Misra–Gries sketch
  * ([[graft.expressions.MisraGriesTopK]]) — the x70 pattern, applied to
  * frequent items instead of cardinality. The exact side is the full
  * (distinct-term) shuffle the oracle can recompute; the sketch side is
  * what a 100 TB caller actually runs: one map-side pass, a
  * `capacity`-entry summary per task, one single-row agg — no posting
  * shuffle. `sketch_ok` asserts the Misra–Gries theorems held on this
  * corpus: every QUALIFYING term (exact count > n/(capacity+1)) is
  * present in the merged summary with its estimate inside
  * [exact − n/(capacity+1), exact]. All comparisons are integer-exact
  * (cross-multiplied by capacity+1) — no float rounding in verdicts.
  */
object HeavyHitters {

  /** (term, n_exact, qualifies, sketch_ok) for the exact top-k terms of
    * `termCol`, ordered (n_exact desc, term asc). The sketch rides in as
    * ONE single-row aggregate broadcast against the k exact rows. */
  def report(df: DataFrame, termCol: String, capacity: Int,
      topK: Int): DataFrame = {
    require(capacity >= 1 && topK >= 1, "capacity and topK must be >= 1")
    val term = col(termCol)
    // one row: total occurrences + the merged sketch summary
    val sk = df.agg(
      count(lit(1)).as("__n"),
      SketchExpressions.misraGriesTopK(term, capacity).as("__sk"))
    // try_element_at: a term absent from the summary yields null (ANSI
    // element_at throws on the empty filter result)
    val est = try_element_at(expr("filter(__sk, s -> s.term = term)"), lit(1))
      .getField("est")
    exactTopK(df, termCol, topK).crossJoin(broadcast(sk))
      .withColumn("__est", est)
      .transform(verdicts(capacity))
  }

  /** The ledger-side twin: verdicts against an already-merged summary
    * (rows of (term, est)) and a one-row totals frame (`__n`) — e.g. the
    * streaming sketch ledger's groupBy-sum over appended per-batch
    * summaries. Both sketch inputs are summary-sized (bounded by
    * batches × tasks × capacity before the merge, capacity-ish after),
    * so they broadcast. */
  def reportFromSummary(df: DataFrame, termCol: String, summary: DataFrame,
      totals: DataFrame, capacity: Int, topK: Int): DataFrame = {
    require(capacity >= 1 && topK >= 1, "capacity and topK must be >= 1")
    exactTopK(df, termCol, topK)
      .join(broadcast(summary.select(col("term"), col("est").as("__est"))),
        Seq("term"), "left")
      .crossJoin(broadcast(totals.select(col("__n"))))
      .transform(verdicts(capacity))
  }

  /** Count-Min point-frequency report ([[graft.expressions.CountMinSketch]],
    * Cormode & Muthukrishnan 2005): the exact top-k terms, each carrying
    * the CM estimate a 100 TB monitor would serve instead of the exact
    * count. The sketch is ONE single-row aggregate (depth×width longs of
    * per-task state, pointwise-sum merge) broadcast against the k exact
    * rows; the estimate is the min over the term's `depth` counters,
    * recomputed here with plain SQL functions over the sketch array —
    * the same md5-bucket arithmetic the aggregate used, so an oracle can
    * rebuild the identical sketch and exact-check `est` itself, not just
    * the verdicts. Verdicts: `never_under` (est >= exact — a CM theorem,
    * must always hold) and `overcount_ok` (est − exact <= 2n/width —
    * holds per term with prob >= 1 − 2^−depth; integer-exact via
    * cross-multiplication). */
  def countMinReport(df: DataFrame, termCol: String, depth: Int,
      width: Int, topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val sk = df.agg(
      count(lit(1)).as("__n"),
      SketchExpressions.countMinSketch(col(termCol), depth, width)
        .as("__sk"))
    exactTopK(df, termCol, topK).crossJoin(broadcast(sk))
      .withColumn("est", cmEstimate(col("__sk"), col("term"), depth, width))
      .transform(cmVerdicts(width))
  }

  /** The ledger-side twin of [[countMinReport]]: verdicts against an
    * already-merged counter table (rows of (pos, cnt), sparse) and a
    * one-row totals frame (`__n`) — e.g. the streaming Count-Min
    * ledger's replay-deduped sum. The counter table is bounded by
    * depth×width entries (index-metadata scale, the k-means-centroid
    * class), so it rides into the plan as a driver-pulled dense literal
    * array — the same sketch column shape the in-query path reads. */
  def countMinReportFromCounters(df: DataFrame, termCol: String,
      counters: DataFrame, totals: DataFrame, depth: Int, width: Int,
      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val arr = new Array[Long](depth * width)
    counters.collect().foreach { r =>
      val pos = r.getAs[Number]("pos").intValue()
      require(pos >= 0 && pos < arr.length, s"counter pos $pos out of range")
      arr(pos) = r.getAs[Number]("cnt").longValue()
    }
    val n = totals.first().getAs[Number](0).longValue()
    exactTopK(df, termCol, topK)
      .withColumn("__n", lit(n))
      .withColumn("est",
        cmEstimate(typedlit(arr.toSeq), col("term"), depth, width))
      .transform(cmVerdicts(width))
  }

  /** CM estimate of `term` from a sketch array column: min over the
    * `depth` counters; row-d counter = first 32 bits of md5("d:" + term)
    * mod width — conv() returns a string, hence the long cast. */
  private def cmEstimate(sketch: Column, term: Column, depth: Int,
      width: Int): Column =
    least((0 until depth).map { d =>
      element_at(sketch,
        (lit(d * width) + conv(substring(md5(
          concat(lit(s"$d:"), term)), 1, 8), 16, 10)
          .cast("long") % width + 1).cast("int"))
    }: _*)

  /** Integer-exact CM verdict columns over (term, n_exact, est, __n). */
  private def cmVerdicts(width: Int)(joined: DataFrame): DataFrame =
    joined
      .withColumn("never_under", col("est") >= col("n_exact"))
      .withColumn("overcount_ok",
        (col("est") - col("n_exact")) * width <= col("__n") * 2L)
      .select(col("term"), col("n_exact"), col("est"),
        col("never_under"), col("overcount_ok"))
      .orderBy(col("n_exact").desc, col("term"))

  private def exactTopK(df: DataFrame, termCol: String, topK: Int): DataFrame =
    df.groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term"))
      .limit(topK)

  /** Integer-exact Misra–Gries verdict columns over (term, n_exact,
    * __est, __n) — shared by the in-query and ledger report paths. */
  private def verdicts(capacity: Int)(joined: DataFrame): DataFrame = {
    val m1 = lit(capacity + 1L)
    joined
      .withColumn("qualifies", col("n_exact") * m1 > col("__n"))
      .withColumn("sketch_ok",
        !col("qualifies") ||
          (col("__est").isNotNull &&
            col("__est") <= col("n_exact") &&
            (col("n_exact") - col("__est")) * m1 <= col("__n")))
      .select(col("term"), col("n_exact"), col("qualifies"), col("sketch_ok"))
      .orderBy(col("n_exact").desc, col("term"))
  }
}
