package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate/exact nearest-neighbor search over embedding columns.
  *
  * `bruteForceTopK` is the exact baseline: all-pairs cosine + windowed
  * rank. Norms are precomputed per side so the join computes one dot
  * product per pair. The query side should be the small side (broadcast).
  *
  * `ivfTopK` is the scale path: partition the corpus into Voronoi cells
  * around centroids (inverted file / IVF), search only the `nProbe`
  * closest cells per query. Candidate volume drops from |corpus| to
  * ~nProbe·|corpus|/k cells, and the expensive join is cell-cocated.
  */
object Similarity {

  /** Exact top-k neighbors for every vector in `queries` against `corpus`.
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k. Cosine is
    * rounded to 4 decimals *before* ranking so results are reproducible
    * across engines and summation orders; ties break by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vc"))
      .withColumn("nc", norm(col("vc")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("vq"))
      .withColumn("nq", norm(col("vq")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosinePrenormed(col("vq"), col("vc"), col("nq"), col("nc")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF approximate top-k: centroids from `centroidsOf` (or any externally
    * trained set), probe the nProbe nearest cells. Deterministic given the
    * centroid set. Returns the same shape as [[bruteForceTopK]]. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    // assign every corpus vector to its nearest centroid cell
    val cent = centroids.select(col("cell"), col("cvec"), norm(col("cvec")).as("cn"))
    def assign(df: DataFrame, id: String, outCell: String, top: Int): DataFrame = {
      val w = Window.partitionBy(id).orderBy(col("csim").desc, col("cell"))
      df.crossJoin(cent)
        .withColumn("csim", cosinePrenormed(col("v"), col("cvec"), col("vn"), col("cn")))
        .withColumn("crk", row_number().over(w))
        .filter(col("crk") <= top)
        .drop("cvec", "cn", "csim", "crk")
        .withColumnRenamed("cell", outCell)
    }
    val c = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"))
        .withColumn("vn", norm(col("v"))),
      "neighbor_id", "cell_c", 1)
      .withColumnsRenamed(Map("v" -> "vc", "vn" -> "nc"))
    val q = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("v"))
        .withColumn("vn", norm(col("v"))),
      "query_id", "cell_q", nProbe)
      .withColumnsRenamed(Map("v" -> "vq", "vn" -> "nq"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("cell_q") === col("cell_c") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosinePrenormed(col("vq"), col("vc"), col("nq"), col("nc")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Mean-vector centroids per label column — a deterministic, cheap way
    * to seed IVF cells when an external k-means isn't available. */
  def centroidsOf(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val dim = org.apache.spark.sql.functions.size(col(vecCol))
    df.select(col(labelCol).as("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("cvec"))
  }
}
