package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup stripping + boilerplate-block removal — the main-content
  * extraction step of web-corpus curation (the block-length heuristic is
  * the primary signal in jusText, Pomikálek 2011, and trafilatura;
  * C4, Raffel et al. JMLR 2020 §2.2, similarly drops short lines).
  *
  * Pipeline per document, all zero-shuffle Column composition (codegen'd
  * regexp + higher-order array functions — no UDF, no extra pass):
  *   1. strip tags: `<[^>]*>` → space (RE2-compatible pattern, identical
  *      semantics in DuckDB oracles);
  *   2. split into newline-delimited blocks; per block collapse runs of
  *      spaces and trim;
  *   3. a block is CONTENT iff it has >= minWords whitespace tokens —
  *      navigation chrome, titles, ad snippets, and footers are short;
  *      article text is long;
  *   4. re-join kept blocks with a single space.
  *
  * Returns the input plus `clean_text`, `n_blocks_kept`,
  * `n_blocks_dropped` (dropped = nonempty blocks below the threshold).
  */
object Boilerplate {

  /** Nonempty trimmed blocks of the tag-stripped html. */
  private def blocks(html: Column): Column =
    filter(
      transform(split(regexp_replace(html, "<[^>]*>", " "), "\n"),
        l => trim(regexp_replace(l, " +", " "))),
      l => l =!= "")

  def extractMainContent(df: DataFrame, htmlCol: String,
      minWords: Int = 5): DataFrame = {
    require(minWords >= 1, "minWords must be >= 1")
    val bs = blocks(col(htmlCol))
    val kept = filter(bs, b => size(split(b, " ")) >= minWords)
    df.withColumn("clean_text", array_join(kept, " "))
      .withColumn("n_blocks_kept", size(kept).cast("long"))
      .withColumn("n_blocks_dropped", (size(bs) - size(kept)).cast("long"))
  }
}
