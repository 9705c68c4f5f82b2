package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Maximal Marginal Relevance selection (Carbonell & Goldstein, SIGIR
  * 1998): pick k items that are RELEVANT to a query embedding but
  * mutually DIVERSE — the selection rule a training-data curator uses
  * when "top-k by similarity" would return k near-copies of the same
  * document:
  *
  *   MMR(p) = rel(p) − λ · max_{s ∈ selected} sim(p, s)
  *
  * greedily, one pick per step (step 1 is pure relevance).
  *
  * Scale shape — the FAISS-refine pattern ([[Pq]] x62's candidate
  * re-rank): the CORPUS-side work is distributed (per-row cosine to the
  * broadcast query vector, top-`poolSize` via TakeOrdered), and the
  * quadratic term is confined to the bounded candidate pool — poolSize²
  * pairwise cosines (576 rows at the default 24), index-metadata scale
  * like the k-means centroid and PQ-codebook pulls. The greedy loop is
  * O(k · poolSize) driver arithmetic over those collected scalars; the
  * corpus is never touched again.
  *
  * Cross-engine determinism: relevance and pairwise cosines are
  * 4dp-rounded doubles (the x05 sequential-fold contract), and the MMR
  * arithmetic runs in EXACT decimal (BigDecimal here, DECIMAL in the
  * SQL oracle): score = rel − λ·maxSim at scale 5, ties broken by id —
  * so the greedy argmax can never flip on float summation noise. */
object Mmr {

  /** Greedy MMR over the `poolSize` most query-relevant vectors.
    * Returns exactly `k` rows (step, id, mmr_score), step 1-based in
    * pick order; `mmr_score` is the decimal-exact MMR value as a
    * double (step 1 = relevance). `lambda` must be an exact decimal
    * (default 0.5). */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, poolSize: Int = 24, k: Int = 8,
      lambda: BigDecimal = BigDecimal("0.5")): DataFrame = {
    require(poolSize >= k && k >= 1, "need poolSize >= k >= 1")
    val spark = df.sparkSession
    val qRows = df.filter(col(idCol) === queryId)
      .select(col(vecCol)).take(2)
    require(qRows.length == 1, s"queryId $queryId must match exactly one row")
    val qVec = qRows(0).getSeq[Float](0)
    val q = typedlit(qVec)
    // distributed: per-row 4dp cosine to the broadcast query literal,
    // pool = top-poolSize by (rel desc, id) — TakeOrderedAndProject
    val rel4 = round(VectorFunctions.cosine(col(vecCol), q), 4)
    val pool = df
      .select(col(idCol).as("id"), col(vecCol).as("v"), rel4.as("rel"))
      .orderBy(col("rel").desc, col("id"))
      .limit(poolSize)
      .persist()
    // bounded quadratic: poolSize² pairwise 4dp cosines, same fold
    val a = pool.select(col("id").as("pa"), col("v").as("va"))
    val b = pool.select(col("id").as("pb"), col("v").as("vb"))
    val sims = a.crossJoin(b).filter(col("pa") =!= col("pb"))
      .select(col("pa"), col("pb"),
        round(VectorFunctions.cosine(col("va"), col("vb")), 4).as("s"))
      .collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb")) ->
        BigDecimal.valueOf(r.getAs[Double]("s")).setScale(4))
      .toMap
    val rels = pool.select(col("id"), col("rel")).collect()
      .map(r => r.getAs[Long]("id") ->
        BigDecimal.valueOf(r.getAs[Double]("rel")).setScale(4))
    pool.unpersist()
    // greedy: decimal-exact scores, ties to the smallest id
    val relMap = rels.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, BigDecimal)]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ relMap.keys
    for (_ <- 1 to k) {
      val pick =
        if (selected.isEmpty)
          remaining.maxBy(id => (relMap(id), -id))
        else
          remaining.maxBy { id =>
            val maxSim = selected.map(s => sims((id, s._1))).max
            (relMap(id) - lambda * maxSim, -id)
          }
      val score =
        if (selected.isEmpty) relMap(pick).setScale(5)
        else (relMap(pick) -
          lambda * selected.map(s => sims((pick, s._1))).max).setScale(5)
      selected += ((pick, score))
      remaining -= pick
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, sc), i) => ((i + 1).toLong, id, sc.toDouble) }
      .toDF("step", "id", "mmr_score")
  }
}
