package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDedup on a handcrafted embedding set with two obvious clusters and
  * known within-cluster duplicate groups — keep set verified exactly. */
class SemDedupSpec extends SparkSpec {

  // Two well-separated directions; near-duplicates are tiny perturbations.
  // dim 4 keeps the fixture readable; the operator is dim-agnostic.
  private def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private val rows = Seq(
    // cluster around +x: ids 1,2,3 mutually near-identical; 4 distinct
    (1L, v(1.0, 0.01, 0.0, 0.0)),
    (2L, v(0.99, 0.02, 0.0, 0.0)),
    (3L, v(1.01, 0.0, 0.01, 0.0)),
    (4L, v(0.6, 0.0, 0.8, 0.0)),     // same half-space, not a dup (cos~0.6)
    // cluster around +y: ids 10,11 dups; 12 distinct
    (10L, v(0.0, 1.0, 0.0, 0.01)),
    (11L, v(0.01, 0.98, 0.0, 0.0)),
    (12L, v(0.0, 0.55, 0.0, 0.84)))  // cos to 10/11 ~0.55

  test("semanticDedup keeps min-id per within-cluster duplicate group") {
    import spark.implicits._
    val df = rows.toDF("id", "vec")
    val out = SemDedup.semanticDedup(df, "id", "vec",
        k = 2, tau = 0.95, iters = 5)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2)))
    val kept = out.filter(_._2).map(_._1).toSet
    val dropped = out.filterNot(_._2).map(_._1).toSet
    assert(kept == Set(1L, 4L, 10L, 12L), s"kept=$kept")
    assert(dropped == Set(2L, 3L, 11L), s"dropped=$dropped")
  }

  test("clusterPairs only pairs within a cell and rounds before tau") {
    import spark.implicits._
    val df = rows.toDF("id", "vec")
    val cents = Similarity.trainKMeans(df, "id", "vec", k = 2, iters = 5)
    val assigned = SemDedup.assignCells(df, "vec", cents)
    // every row assigned to exactly one of the k cells
    val cells = assigned.select("cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf(Set(0, 1)) && cells.nonEmpty)
    assert(assigned.count() == rows.size)
    val pairs = SemDedup.clusterPairs(assigned, "id", "vec", tau = 0.95)
      .collect()
    // all pairs are same-cell by construction, id_a < id_b, cos >= tau
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(3) >= 0.95)
    }
    // cross-cluster near-misses (4 vs 1..3, 12 vs 10/11) never appear
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet == Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)),
      s"pairs=$pairSet")
  }

  test("assignCells refuses to overwrite an existing cell column") {
    import spark.implicits._
    val df = rows.toDF("id", "vec").withColumn("cell", lit(0))
    val cents = Similarity.trainKMeans(df, "id", "vec", k = 2, iters = 2)
    val e = intercept[IllegalArgumentException] {
      SemDedup.assignCells(df, "vec", cents)
    }
    assert(e.getMessage.contains("cell"))
  }
}
