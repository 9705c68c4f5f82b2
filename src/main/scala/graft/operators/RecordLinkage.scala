package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter, "A Theory for Record
  * Linkage", JASA 1969) — the entity-resolution member of the dedup
  * family: where document dedup matches free text, linkage matches
  * STRUCTURED records (customers, suppliers, users) whose fields
  * disagree through typos, truncation, and staleness rather than
  * paraphrase.
  *
  * The FS decision rule: for each candidate pair, each compared field k
  * contributes log(m_k/u_k) if it agrees and log((1−m_k)/(1−u_k)) if it
  * disagrees (m = P(agree | same entity), u = P(agree | different
  * entities)); the summed weight is thresholded into
  * match / possible / non-match. This implementation takes the
  * (m, u)-derived weights as PINNED integer micro literals — the
  * caller estimates them offline (EM, clerical review) and the scoring
  * pass is then pure integer arithmetic: every score is an exact Σ of
  * literals, hash-identical across engines by construction.
  *
  * Scale shape: candidate generation is a blocked equi-join — the
  * standard linkage scale path (Christen, "Data Matching", 2012):
  * quadratic work exists only WITHIN a block, so the caller picks block
  * keys with bounded fan-out (e.g. phone-digit prefixes, not
  * nation-sized regions); the join itself shuffles on the block key and
  * AQE's skew split handles hot blocks. Field comparators are per-row
  * codegen'd Columns; no windows, no collects.
  */
object RecordLinkage {

  /** One compared field: `agree` evaluates over the joined pair frame
    * (left columns suffixed `_l`, right `_r`); the micro weights are
    * ln(m/u)·10⁶ and ln((1−m)/(1−u))·10⁶, pinned by the caller. */
  case class FieldWeight(name: String, agree: Column,
      agreeMicro: Long, disagreeMicro: Long)

  /** Score all block-key candidate pairs of `left` × `right`.
    *
    * Both inputs must carry `idCol` and every `blockKeys` column; all
    * non-id, non-block columns are suffixed `_l` / `_r` in the pair
    * frame the `fields` comparators see. Output: (id_l, id_r, one 0/1
    * `<name>_agree` per field, score_micro, decision) with decision =
    * match (score ≥ upperMicro) / possible (≥ lowerMicro) / non_match.
    */
  def linkScored(left: DataFrame, right: DataFrame, idCol: String,
      blockKeys: Seq[String], fields: Seq[FieldWeight],
      upperMicro: Long, lowerMicro: Long): DataFrame = {
    require(blockKeys.nonEmpty, "blocked linkage needs >= 1 block key")
    require(fields.nonEmpty, "no compared fields")
    require(lowerMicro <= upperMicro, "thresholds out of order")
    def suffixed(df: DataFrame, sfx: String): DataFrame =
      df.columns.foldLeft(df) { (d, c) =>
        if (c == idCol) d.withColumnRenamed(c, s"id$sfx")
        else if (blockKeys.contains(c)) d
        else d.withColumnRenamed(c, s"$c$sfx")
      }
    val pairs = suffixed(left, "_l").join(suffixed(right, "_r"), blockKeys)
    val withBits = fields.foldLeft(pairs) { (df, f) =>
      df.withColumn(s"${f.name}_agree",
        when(f.agree, lit(1)).otherwise(lit(0)))
    }
    val score = fields.map(f =>
      when(col(s"${f.name}_agree") === 1, lit(f.agreeMicro))
        .otherwise(lit(f.disagreeMicro))).reduce(_ + _)
    withBits
      .withColumn("score_micro", score)
      .withColumn("decision",
        when(col("score_micro") >= upperMicro, "match")
          .when(col("score_micro") >= lowerMicro, "possible")
          .otherwise("non_match"))
      .select(Seq(col("id_l"), col("id_r")) ++
        fields.map(f => col(s"${f.name}_agree")) ++
        Seq(col("score_micro"), col("decision")): _*)
  }
}
