package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation — MRR, recall@k, NDCG@k (Järvelin &
  * Kekäläinen TOIS 2002 for DCG; the standard trio every retriever /
  * embedding model / ANN index ships with). Relevance here is GROUP
  * membership (same label/source/cluster as the query — the
  * clustering-style eval that needs no human qrels), so the denominators
  * come from group sizes, never a materialized quadratic qrel table.
  *
  * Determinism contract: all metrics are micro-unit integers. Position
  * discounts w_i = round(10^6 / log2(i+1)) are a k-sized integer table
  * both engines derive identically (log2 of small constants, rounded at
  * 1e-6 — the x40 ln-rounding class); DCG sums those integers, IDCG is
  * the prefix sum at min(n_rel, k), and every ratio is a truncating
  * integer division.
  *
  * Scale shape: `runs` carries |queries|·k rows; labels attach by two
  * slim id joins; per-query reduction is one aggregation; the group
  * summary aggregates the queries-sized frame. Nothing quadratic. */
object RetrievalEval {

  /** Per-group summary over a top-k run list. `runs` = (query_id,
    * doc_id, rank) with rank 1..k per query (self-hits should already be
    * excluded). `entities` = (id, group). Queries whose group has no
    * OTHER member (n_rel = 0) are excluded — no metric is defined for
    * them. Output: (group, n_queries, mrr_micro, recall_micro,
    * ndcg_micro), means over the group's queries. */
  def groupRelevanceEval(entities: DataFrame, idCol: String,
      groupCol: String, runs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"bad k $k")
    val ent = entities.select(col(idCol).as("__id"), col(groupCol).as("__g"))
    val sizes = ent.groupBy(col("__g")).agg(count(lit(1)).as("__gn"))
    val q = ent.select(col("__id").as("query_id"), col("__g").as("qg"))
      .join(sizes.select(col("__g").as("qg"), col("__gn")), Seq("qg"))
      .withColumn("n_rel", least(col("__gn") - 1, lit(k.toLong)))
      .filter(col("n_rel") > 0)
    val d = ent.select(col("__id").as("doc_id"), col("__g").as("dg"))
    // per-rank integer discount; hits carry it, misses carry 0
    val w = expr("CAST(round(1000000 / log2(rank + 1)) AS BIGINT)")
    val perQuery = runs
      .filter(col("rank") <= k)
      .join(d, Seq("doc_id"))
      .join(q.select(col("query_id"), col("qg"), col("n_rel")), Seq("query_id"))
      .withColumn("hit", col("dg") === col("qg"))
      .groupBy(col("query_id"), col("qg"), col("n_rel"))
      .agg(
        min(when(col("hit"), col("rank"))).as("first_rel"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"),
        sum(when(col("hit"), w).otherwise(0L)).as("dcg"))
    val scored = perQuery
      .withColumn("idcg", expr("""aggregate(
        sequence(1, CAST(n_rel AS INT)), CAST(0 AS BIGINT),
        (acc, i) -> acc + CAST(round(1000000 / log2(i + 1)) AS BIGINT))"""))
      .withColumn("rr_micro", coalesce(
        expr("1000000 div first_rel"), lit(0L)))
      .withColumn("recall_micro", expr("n_hits * 1000000 div n_rel"))
      .withColumn("ndcg_micro", expr("dcg * 1000000 div idcg"))
    scored.groupBy(col("qg").as("group"))
      .agg(count(lit(1)).as("n_queries"),
        expr("sum(rr_micro) div count(1)").as("mrr_micro"),
        expr("sum(recall_micro) div count(1)").as("recall_micro"),
        expr("sum(ndcg_micro) div count(1)").as("ndcg_micro"))
  }
}
