package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the classic keyword /
  * relevance primitive for training-data curation (smoothed idf:
  * ln((N+1)/(df+1))).
  *
  * Shuffle shape at scale: explode → one hash agg per (doc,term) with
  * map-side combine, one per term (the df table — |vocab| rows, usually
  * broadcastable), a broadcast of the single-row corpus count, and the
  * per-doc top-k window. No driver-side collects.
  */
object Tfidf {

  /** Top-`k` terms per document by tf·idf.
    * Output: (doc_id, rank, term, score), score rounded to `scale` so
    * cross-engine float noise cannot flip ranks checked by the oracle. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int, scale: Int = 4): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), scale)
          .as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "score")
  }
}
