package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss-style signed random projection of embeddings
  * to a lower dimension (Achlioptas, JCSS 2003: ±1 entries suffice; the
  * same deterministic md5-seeded hyperplane family as the SRP-LSH
  * machinery, [[Dedup.srpSigns]]) — the cheap-ANN/dedup preprocessing
  * step: at 100 TB, halving the embedding width halves every downstream
  * shuffle, cache and dot-product cost, at a quantifiable similarity
  * distortion (E[cos distortion] ~ 1/sqrt(m)).
  *
  * Components are UNSCALED dot products (the 1/sqrt(m) JL factor is
  * omitted: cosine similarity — the only metric the downstream dedup/ANN
  * operators use — is scale-invariant, and omitting the factor keeps
  * every component an exact 4dp-rounded double a SQL oracle reproduces).
  * Callers needing Euclidean-distance preservation scale by 1/sqrt(m)
  * themselves.
  *
  * Scale shape: projection is a zero-shuffle per-row map (m codegen'd
  * [[graft.expressions.FloatVecDot]]s against ±1 literal hyperplanes);
  * the preservation report joins consecutive-id pairs — one id-keyed
  * shuffle join, linear in the corpus, never pairwise. */
object JlProjection {

  /** (idCol, proj array<double>[m]): 4dp-rounded signed projections. */
  def project(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int): DataFrame = {
    require(dim >= 1 && m >= 1, "dim and m must be >= 1")
    val signs = Dedup.srpSigns(m, dim)
    val comps = (0 until m).map { p =>
      round(graft.expressions.VectorExpressions.floatVecDot(
        col("__v"), typedLit(signs(p).toSeq)), 4)
    }
    df.select(col(idCol), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull && size(col("__v")) === dim)
      .select(col(idCol), array(comps: _*).as("proj"))
  }

  /** Sequential-fold double dot over array<double> columns — the x05
    * arithmetic contract (left-to-right, matching list_sum order). */
  private def ddot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc, v) => acc + v)

  /** Cosine-preservation report over consecutive-id pairs (even id,
    * even id + 1): (id_a, id_b, cos_orig, cos_proj, abs_err,
    * within_bound). `bound` should sit >= 3 standard deviations of the
    * estimator noise (sigma ~ sqrt((1 + cos^2)/m)); per-pair verdicts
    * at small m are necessarily loose — the spec-level adjudication is
    * the mean error, which concentrates as 1/sqrt(pairs). */
  def pairPreservation(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, bound: Double): DataFrame = {
    require(bound > 0.0, "bound must be positive")
    val id = col(idCol)
    val orig = df.select(id.as("oid"), col(vecCol).as("v"))
      .filter(col("v").isNotNull && size(col("v")) === dim)
    val proj = project(df, idCol, vecCol, dim, m)
      .select(id.as("pid"), col("proj"))
    val joined = orig.filter(col("oid") % 2 === 0)
      .select(col("oid").as("id_a"), col("v").as("va"))
      .join(orig.select((col("oid") - 1).as("id_a"), col("v").as("vb"),
        col("oid").as("id_b")), "id_a")
      .join(proj.select(col("pid").as("id_a"), col("proj").as("pa")),
        "id_a")
      .join(proj.select((col("pid") - 1).as("id_a"),
        col("proj").as("pb")), "id_a")
    val dvv = graft.expressions.VectorExpressions.floatVecDot _
    def cosF(ab: Column, aa: Column, bb: Column): Column =
      when(aa * bb === 0.0, lit(0.0))
        .otherwise(round(ab / (sqrt(aa) * sqrt(bb)), 4))
    joined
      .withColumn("cos_orig", cosF(dvv(col("va"), col("vb")),
        dvv(col("va"), col("va")), dvv(col("vb"), col("vb"))))
      .withColumn("cos_proj", cosF(ddot(col("pa"), col("pb")),
        ddot(col("pa"), col("pa")), ddot(col("pb"), col("pb"))))
      .withColumn("abs_err", round(abs(col("cos_orig") - col("cos_proj")), 4))
      .withColumn("within_bound", col("abs_err") <= bound)
      .select(col("id_a"), col("id_b"), col("cos_orig"), col("cos_proj"),
        col("abs_err"), col("within_bound"))
  }
}
