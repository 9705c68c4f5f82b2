package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (optimization rounds): stage-level wall attribution for
  * the x203 composition — times each leg separately so the optimization
  * target is measured, not guessed. Not part of the driver contract. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Pq, Similarity, VectorFixtures}
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup pass then measured pass
    for (pass <- 1 to 2) {
      spark.catalog.clearCache()
      println(s"--- pass $pass")
      val e = t("fixture+persist") {
        val e = VectorFixtures.plantedClusters(spark, n = 4000,
          clusters = 32, dim = 64, noise = 0.25).persist()
        e.count(); e
      }
      val eq = e.filter(col("vec_id") % 10 === 0)
      val cents = t("trainKMeans") {
        Similarity.trainKMeans(e, "vec_id", "embedding", k = 32, iters = 5)
      }
      val centSeq = t("collect cents") {
        cents.orderBy(col("cell")).collect().map(_.getSeq[Float](1)).toIndexedSeq
      }
      val resid = Pq.residuals(e, "embedding", centSeq)
      val cbs = t("trainCodebooks") {
        Pq.trainCodebooks(resid, "vec_id", "__resid",
          dim = 64, m = 16, ksub = 128, iters = 5)
      }
      val recon = t("recon persist") {
        val r = Pq.ivfPqReconstruct(e, "vec_id", "embedding", centSeq, cbs)
          .select(col("vec_id"), col("recon").as("embedding")).persist()
        r.count(); r
      }
      val candidates = t("ivfTopK") {
        val c = Similarity.ivfTopK(recon, eq, cents, "vec_id",
          "embedding", k = 50, nProbe = 1)
          .select(col("query_id"), col("neighbor_id"))
        c.write.format("noop").mode("overwrite").save(); c
      }
      t("refineTopK") {
        Similarity.refineTopK(candidates, e, eq, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
          .write.format("noop").mode("overwrite").save()
      }
      t("bruteForceExact") {
        Similarity.bruteForceTopKBroadcast(e, eq, "vec_id", "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
          .write.format("noop").mode("overwrite").save()
      }
      t("ivfScanStats") {
        Similarity.ivfScanStats(recon, eq, cents, "vec_id", "embedding",
          nProbe = 1).write.format("noop").mode("overwrite").save()
      }
      e.unpersist(); recon.unpersist()
    }
    spark.stop()
  }
}
