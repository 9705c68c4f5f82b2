package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocklist screening — the C4 "bad word" page filter (Raffel et al.
  * JMLR 2020 §2.2) and MassiveText's equivalent (Rae et al. 2021),
  * generalized to word phrases: count every token-boundary occurrence
  * of every blocklist phrase per document and emit the per-doc verdict
  * a curation pass filters on.
  *
  * Scale shape: the entire screen is ONE zero-shuffle map over the
  * corpus — the [[graft.expressions.PhraseHits]] word-level
  * Aho–Corasick automaton scans each document once regardless of
  * blocklist size (production lists run to hundreds of phrases; a
  * per-phrase HOF or regex pass would be O(phrases × corpus)). The
  * blocklist itself is a plan literal compiled into the expression —
  * nothing joins, nothing broadcasts. */
object Blocklist {

  /** Per-document screen. `phrases` are space-separated word phrases,
    * matched at token boundaries with overlaps counted (the
    * Aho–Corasick convention; "slow query" also counts a "slow" hit if
    * both are listed). Columns: (idCol, n_hits, n_phrases, top_phrase,
    * blocked); `top_phrase` is the most-frequent matched phrase (first
    * in list order on ties, null when clean), `blocked` = any hit. */
  def screen(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    val split = phrases.map(_.split(" ", -1).toSeq)
    require(split.forall(_.forall(_.nonEmpty)),
      "phrases must be non-empty words separated by single spaces")
    val hits: Column = graft.expressions.TextExpressions
      .phraseHits(col(textCol), split)
    df.select(col(idCol),
        hits.as("hits"))
      .select(col(idCol),
        aggregate(col("hits"), lit(0L), (acc, x) => acc + x)
          .as("n_hits"),
        size(filter(col("hits"), _ > 0L)).cast("long").as("n_phrases"),
        // first index of the max count (array_position's tie rule)
        when(array_max(col("hits")) > 0L,
          element_at(
            lit(phrases.toArray),
            array_position(col("hits"), array_max(col("hits")))
              .cast("int")))
          .as("top_phrase"))
      .withColumn("blocked", col("n_hits") > 0L)
  }
}
