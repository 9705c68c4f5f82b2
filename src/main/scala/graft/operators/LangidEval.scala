package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier-vs-label confusion matrix for the stopword-profile
  * language identifier (x20's scorer) against a labeled column — the
  * eval report a pipeline runs before TRUSTING a heuristic classifier
  * for routing or filtering: per (label, prediction) cell counts and
  * the fraction of each label's mass landing there. A label the
  * profile table doesn't cover (e.g. zh here) shows up immediately as
  * a scattered row — exactly the failure this report exists to expose.
  *
  * Scale shape: one zero-shuffle scoring pass (the native
  * [[graft.expressions.TextExpressions.profileScores]] walk) + ONE
  * (label, pred) count aggregation; per-label totals derive from the
  * cells (labels-sized frame, broadcast back). Fractions use the x104
  * integer half-up micro-rounding — cell/total ratios are exactly the
  * dyadic-boundary class double rounding tie-breaks on. */
object LangidEval {

  /** (lang_true, lang_pred, n, frac_of_true, is_correct) per non-empty
    * confusion cell, frac_of_true 6dp. */
  def confusion(df: DataFrame, labelCol: String,
      textCol: String): DataFrame = {
    val profs = graft.functions.TextFunctions.langProfiles
    val base = df.withColumn("__sc", graft.expressions.TextExpressions
      .profileScores(col(textCol), profs.map(_._2)))
    val scored = profs.zipWithIndex.foldLeft(base) {
      case (d, ((lang, _), i)) =>
        d.withColumn(s"__c_$lang", element_at(col("__sc"), i + 1))
    }
    val cells = scored
      .select(col(labelCol).as("lang_true"),
        graft.functions.TextFunctions.langPredict(
          profs.map { case (l, _) => l -> col(s"__c_$l") })
          .as("lang_pred"))
      .groupBy(col("lang_true"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("lang_true"))
      .agg(sum(col("n")).as("tot"))
    cells
      .join(broadcast(totals), "lang_true")
      .withColumn("frac_of_true",
        expr("CAST((n*2000000 + tot) DIV (2*tot) AS DOUBLE)/1000000.0"))
      .withColumn("is_correct", col("lang_true") === col("lang_pred"))
      .select(col("lang_true"), col("lang_pred"), col("n"),
        col("frac_of_true"), col("is_correct"))
  }
}
