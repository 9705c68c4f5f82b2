package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficients over an
  * undirected edge list — the density check for near-dup graphs: a dup
  * CLUSTER closes its triangles (every member matches every member), a
  * dup CHAIN (A~B~C but A!~C, the LSH-banding artifact) doesn't, so a
  * low clustering coefficient on a high-degree node is the signature
  * of a hub false-positive gluing unrelated docs before connected
  * components fuses them.
  *
  * Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii
  * WWW'11; node-iterator++ of Schank & Wagner '05) — orient every edge
  * from its (degree, id)-smaller endpoint, enumerate wedges only at
  * each triangle's smallest corner, close by an oriented-edge equi-
  * join. Orientation bounds out-degree by O(sqrt(m)), so wedge fan-out
  * is m^1.5 worst-case instead of sum(d^2) — the difference between a
  * hub node exploding and not, and the whole reason this beats the
  * naive neighbor self-join at 100 TB.
  *
  * Scale shape: edge canonicalize + distinct, one degree agg, two id
  * joins to attach degrees, the src-keyed wedge self-join, the (v, w)
  * closing equi-join, one corner count agg — every frame edge-list-
  * bounded, no windows, no collects, no cross joins. Degrees and the
  * oriented edge list persist via the CacheScope knob (two and three
  * consumers). Ratios are truncating BIGINT micro. */
object Triangles {

  /** (id, degree, triangles, cc_micro) per node; cc = 2t / d(d-1),
    * 0 when degree < 2. */
  def perNode(edges: DataFrame, aCol: String, bCol: String,
      scope: Option[CacheScope] = None): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
    val deg = CacheScope.route(scope, e
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree")))
    val withDeg = e
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val o = CacheScope.route(scope, withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("db")).otherwise(col("da")).as("dd"),
      when(aFirst, col("b")).otherwise(col("a")).as("did")))
    val w1 = o.select(col("src"), col("dd").as("vd"), col("did").as("v"))
    val w2 = o.select(col("src"), col("dd").as("wd"), col("did").as("w"))
    val wedges = w1.join(w2, Seq("src"))
      .filter(struct(col("vd"), col("v")) < struct(col("wd"), col("w")))
    val tri = wedges.join(
      o.select(col("src").as("v"), col("did").as("w")), Seq("v", "w"))
    val corners = tri
      .select(explode(array(col("src"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.join(corners, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2, expr(
          "2 * coalesce(triangles, 0) * 1000000 div (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("cc_micro"))
  }
}
