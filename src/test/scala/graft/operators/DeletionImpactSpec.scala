package graft.operators

import graft.SparkSpec

/** DeletionImpact.report vs hand-computed shard coverage. */
class DeletionImpactSpec extends SparkSpec {

  test("per-shard coverage, shares and rewrite flags match hand computation") {
    import spark.implicits._
    val assigned = Seq(
      (1L, 0L, 100L), (2L, 0L, 300L),   // shard 0: 2 docs, 400 bytes
      (3L, 1L, 50L), (4L, 1L, 50L),     // shard 1: 2 docs, 100 bytes
      (5L, 2L, 10L))                    // shard 2: untouched
      .toDF("doc_id", "shard", "n_bytes")
    val deletes = Seq(2L, 3L, 4L, 999L).toDF("doc_id")
    val out = DeletionImpact.report(assigned, deletes,
      "doc_id", "shard", "n_bytes").orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getBoolean(7),
        r.getLong(8)))
    assert(out(0) == (0L, 2L, 400L, 1L, 300L, 0.5, 0.75, true, 1L))
    assert(out(1) == (1L, 2L, 100L, 2L, 100L, 1.0, 1.0, true, 1L))
    assert(out(2) == (2L, 1L, 10L, 0L, 0L, 0.0, 0.0, false, 1L))
  }

  test("duplicate delete ids collapse; empty delete list touches nothing") {
    import spark.implicits._
    val assigned = Seq((1L, 0L, 10L)).toDF("doc_id", "shard", "n_bytes")
    val dup = Seq(1L, 1L, 1L).toDF("doc_id")
    val r = DeletionImpact.report(assigned, dup,
      "doc_id", "shard", "n_bytes").collect().head
    assert(r.getLong(3) == 1L && r.getLong(8) == 0L)
    val none = DeletionImpact.report(assigned,
      Seq.empty[Long].toDF("doc_id"), "doc_id", "shard", "n_bytes")
      .collect().head
    assert(none.getLong(3) == 0L && !none.getBoolean(7)
      && none.getLong(8) == 0L)
  }
}
