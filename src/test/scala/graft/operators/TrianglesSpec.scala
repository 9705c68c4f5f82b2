package graft.operators

import graft.SparkSpec

/** Triangles.perNode: hand-computed counts on a triangle + pendant, the
  * K4 clique, duplicate/reversed-edge canonicalization, self-loop drop,
  * and the triangle-free chain. */
class TrianglesSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    Triangles.perNode(edges.toDF("x", "y"), "x", "y")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3))))
      .toMap
  }

  test("triangle with a pendant: counts and clustering coefficients") {
    val out = run(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L))
    assert(out(1L) == ((2L, 1L, 1000000L)), out)
    assert(out(2L) == ((2L, 1L, 1000000L)), out)
    // node 3: degree 3, 1 triangle, cc = 2/(3*2) = 333333 truncated
    assert(out(3L) == ((3L, 1L, 333333L)), out)
    assert(out(4L) == ((1L, 0L, 0L)), out)
  }

  test("K4: four triangles, every node in three, cc = 1") {
    val out = run(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L,
      2L -> 4L, 3L -> 4L))
    assert(out.values.toSeq == Seq.fill(4)((3L, 3L, 1000000L)), out)
  }

  test("reversed duplicates and self-loops canonicalize away") {
    val out = run(Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L,
      2L -> 3L, 2L -> 2L))
    assert(out(1L) == ((2L, 1L, 1000000L)), out)
    assert(out.size == 3, out)
  }

  test("a chain has wedges but no triangles") {
    val out = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L))
    assert(out.values.forall(_._2 == 0L), out)
    assert(out(2L) == ((2L, 0L, 0L)), out)
  }
}
