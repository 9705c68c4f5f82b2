package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al., JMLR 2020 §3.1.4): mask
  * token spans with numbered sentinels; inputs = the document with each
  * masked span replaced by `<extra_id_j>`, targets = each sentinel
  * followed by the tokens it hides, closed by one final sentinel — the
  * denoising-pretraining example generator.
  *
  * The original samples spans at random (~15% corruption, mean span 3);
  * this generator is the DETERMINISTIC stride variant: spans of
  * `spanLen` tokens start every `stride` positions from an md5-derived
  * per-doc offset (corruption rate = spanLen/stride exactly, per-doc
  * phase variety, engine-portable arithmetic — the x102 discipline).
  *
  * Scale shape: ONE zero-shuffle per-row map, HOF/expression-only. */
object SpanCorruption {

  /** (idCol, n_tokens, n_spans, inputs, targets, corruption_ratio).
    * Docs shorter than stride tokens are dropped (no full span fits
    * reliably; emitting them uncorrupted would silently dilute the
    * corruption rate). */
  def corrupt(df: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 3, stride: Int = 20): DataFrame = {
    require(spanLen >= 1 && stride > spanLen,
      "need stride > spanLen >= 1")
    val ts = split(col(textCol), " ")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    def sentinel(j: Column): Column =
      concat(lit("<extra_id_"), j.cast("string"), lit(">"))
    val base = df
      .select(col(idCol), ts.as("ts"), size(ts).as("n"))
      .filter(col("n") >= stride)
      .withColumn("off", pmod(h, lit(stride)).cast("int"))
    val rel = (p: Column) => p - col("off")
    val masked = (p: Column) =>
      rel(p) >= 0 && pmod(rel(p), lit(stride)) < spanLen
    val spanStart = (p: Column) =>
      rel(p) >= 0 && pmod(rel(p), lit(stride)) === 0
    val spanId = (p: Column) => (rel(p) / stride).cast("int")
    val positions = sequence(lit(0), col("n") - 1)
    base
      .withColumn("n_spans",
        size(filter(positions, p => spanStart(p))).cast("long"))
      .withColumn("n_masked",
        size(filter(positions, p => masked(p))).cast("long"))
      .withColumn("inputs", array_join(flatten(transform(positions, p =>
        when(spanStart(p), array(sentinel(spanId(p))))
          .when(masked(p), array().cast("array<string>"))
          .otherwise(array(element_at(col("ts"), p + 1))))), " "))
      .withColumn("targets", array_join(concat(
        flatten(transform(filter(positions, p => spanStart(p)), p =>
          concat(array(sentinel(spanId(p))),
            slice(col("ts"), p + 1, lit(spanLen))))),
        array(sentinel(col("n_spans")))), " "))
      .withColumn("corruption_ratio",
        round(col("n_masked").cast("double") / col("n"), 4))
      .select(col(idCol), col("n").cast("long").as("n_tokens"),
        col("n_spans"), col("inputs"), col("targets"),
        col("corruption_ratio"))
  }
}
