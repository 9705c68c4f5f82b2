package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic embedding fixtures. Promoted from the dev
  * RecallProbe so the registered bounded-scan ANN entry (x203) and the
  * sweep tool measure the SAME corpus: planted Gaussian clusters are
  * the regime real embedding corpora live in at scale, where coarse
  * cells concentrate each query's true neighbors and recall must hold
  * at SMALL scan fractions (the BASELINE.md round-13 probe — the
  * near-isotropic corpus fixture cannot exercise nlist scaling).
  */
object VectorFixtures {

  /** Planted clusters: centers ~ N(0,1)^dim, points = normalized
    * (center + noise·N(0,1)^dim), point i on center i % clusters.
    * Deterministic for a given seed (driver-generated — n×dim floats,
    * a few MB at the 10k probe size; this is FIXTURE synthesis, not a
    * data path, so the driver loop is by design). */
  def plantedClusters(spark: SparkSession, n: Int, clusters: Int,
      dim: Int, noise: Double, seed: Long = 62L): DataFrame = {
    require(n >= clusters && clusters >= 2,
      s"need n >= clusters >= 2, got n=$n clusters=$clusters")
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(clusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until n).map { i =>
      val c = centers(i % clusters)
      val v = Array.tabulate(dim)(d => c(d) + noise * rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / norm).toFloat).toSeq)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }
}
