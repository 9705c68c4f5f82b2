package graft.operators

import graft.SparkSpec

/** Hierarchy.flattenToRoots: hand forests, the log-round deep chain,
  * cycle/dangling/self-loop loudness, maxDepth enforcement. */
class HierarchySpec extends SparkSpec {

  private def flat(rows: Seq[(Long, java.lang.Long)], maxDepth: Long = 64) = {
    import spark.implicits._
    Hierarchy.flattenToRoots(rows.toDF("id", "par"), "id", "par", maxDepth)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("two trees: every node gets its own root and exact depth") {
    //   1            6
    //  / \           |
    // 2   3          7
    //     |
    //     4
    //     |
    //     5
    val out = flat(Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 1L), (3L, 1L), (4L, 3L), (5L, 4L),
      (6L, null), (7L, 6L)))
    assert(out == Map(
      1L -> ((1L, 0L)), 2L -> ((1L, 1L)), 3L -> ((1L, 1L)),
      4L -> ((1L, 2L)), 5L -> ((1L, 3L)),
      6L -> ((6L, 0L)), 7L -> ((6L, 1L))), out)
  }

  test("a 100-deep chain converges (pointer jumping, not 100 rounds)") {
    val chain = (0L to 100L).map(i =>
      (i, if (i == 0) null else java.lang.Long.valueOf(i - 1)))
    val out = flat(chain, maxDepth = 128)
    assert(out(100L) == ((0L, 100L)), out(100L))
    assert(out(50L) == ((0L, 50L)), out(50L))
    assert(out(0L) == ((0L, 0L)))
  }

  test("all-roots input is a fixed point") {
    val out = flat(Seq[(Long, java.lang.Long)]((1L, null), (2L, null)))
    assert(out == Map(1L -> ((1L, 0L)), 2L -> ((2L, 0L))), out)
  }

  test("self-parent and dangling parent fail loudly up front") {
    val e1 = intercept[IllegalArgumentException] {
      flat(Seq[(Long, java.lang.Long)]((1L, 1L)))
    }
    assert(e1.getMessage.contains("own parent"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      flat(Seq[(Long, java.lang.Long)]((1L, null), (2L, 99L)))
    }
    assert(e2.getMessage.contains("not a node"), e2.getMessage)
  }

  test("a 2-cycle fails loudly at maxRounds (non-convergence)") {
    val e = intercept[IllegalStateException] {
      flat(Seq[(Long, java.lang.Long)]((1L, 2L), (2L, 1L), (3L, null)),
        maxDepth = 8)
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
  }

  test("depth beyond maxDepth fails loudly, within maxDepth passes") {
    val chain = (0L to 40L).map(i =>
      (i, if (i == 0) null else java.lang.Long.valueOf(i - 1)))
    intercept[IllegalStateException] { flat(chain, maxDepth = 8) }
    assert(flat(chain, maxDepth = 40)(40L) == ((0L, 40L)))
  }
}
