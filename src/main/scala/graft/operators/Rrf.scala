package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * combine several retrieval rankings of the same id space into one,
  * scoring each id by Σ_lists 1/(k + rank). The production hybrid-
  * retrieval pattern — fuse a lexical (BM25) list with an embedding
  * (ANN) list — where neither score scale is comparable but ranks are.
  * RRF needs no score calibration at all, which is why it wins in
  * practice and why it fuses here on rank columns only.
  *
  * Scale shape: input lists are BOUNDED top-K retrieval outputs (the
  * x81 / x05 TakeOrdered shape), so every rank computation and the
  * fusion aggregate run over K-row relations — index-metadata scale.
  * [[boundedRank]] deliberately avoids the `row_number() OVER (ORDER
  * BY ...)` global-window funnel: on a bounded list the K×K broadcast
  * comparison join costs nothing and keeps the no-global-window
  * invariant the plan lint enforces registry-wide.
  *
  * Cross-engine determinism: each contribution is 1/(k+rank) rounded
  * to 8dp and summed as DECIMAL(18,8) — integer ranks in, exact
  * decimal out; ties broken by id everywhere. */
object Rrf {

  /** 1-based ranks of a BOUNDED top-K list by (`scoreCol` desc, `idCol`
    * asc), as (id, rank) — computed with a broadcast K×K comparison
    * join, not a single-partition window. Scores must already be
    * cross-engine-stable (rounded); ties break by id. */
  def boundedRank(df: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val a = df.select(col(idCol).as("__id"), col(scoreCol).as("__s"))
    val b = df.select(col(idCol).as("__id2"), col(scoreCol).as("__s2"))
    a.join(broadcast(b),
        col("__s2") > col("__s") ||
          (col("__s2") === col("__s") && col("__id2") < col("__id")),
        "left")
      .groupBy(col("__id"))
      .agg((count(col("__id2")) + 1L).as("rank"))
      .select(col("__id").as(idCol), col("rank"))
  }

  /** Fuse ranked lists (each (idCol, rank), 1-based) by reciprocal rank:
    * rrf_score = Σ round(1/(k + rank), 8), exact-decimal-summed. Returns
    * the top `topN` ids by (rrf_score desc, id asc) with per-id list hit
    * count. Ids missing from a list simply contribute nothing (the
    * standard union semantics). */
  def fuse(lists: Seq[DataFrame], idCol: String, k: Int = 60,
      topN: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k >= 0, "k must be >= 0")
    val contrib = round(lit(1.0) / (lit(k) + col("rank")), 8)
      .cast(DecimalType(18, 8))
    val union = lists
      .map(_.select(col(idCol), contrib.as("__c")))
      .reduce(_ unionByName _)
    union.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"),
        round(sum(col("__c")), 8).cast("double").as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topN)
  }
}
