package graft.operators

import graft.SparkSpec

/** Sampling.packManifest vs hand-computed offsets. */
class PackManifestSpec extends SparkSpec {

  test("offsets, positions and bin totals match hand computation") {
    import spark.implicits._
    // one shard, budget 10, tokens 4,4,4,9,2 in id order:
    // exclusive prefixes 0,4,8,12,21 → bins 0,0,0,1,2
    val df = Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 9L), (4L, 2L))
      .toDF("doc_id", "n_tokens")
      .withColumn("doc_id", org.apache.spark.sql.functions
        .col("doc_id") * 1)  // keep simple longs
    val out = Sampling.packManifest(df, "doc_id", "n_tokens",
      budget = 10L, shards = 1).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin"),
        r.getAs[Long]("pos_in_bin"), r.getAs[Long]("offset"),
        r.getAs[Long]("end_offset"), r.getAs[Long]("bin_docs"),
        r.getAs[Long]("bin_fill")))
    assert(out(0) == (0L, 0L, 1L, 0L, 4L, 3L, 12L))
    assert(out(1) == (1L, 0L, 2L, 4L, 8L, 3L, 12L))
    // straddler: starts at 8 < budget, spills fill to 12
    assert(out(2) == (2L, 0L, 3L, 8L, 12L, 3L, 12L))
    // next bin starts fresh at offset 0
    assert(out(3) == (3L, 1L, 1L, 0L, 9L, 1L, 9L))
    assert(out(4) == (4L, 2L, 1L, 0L, 2L, 1L, 2L))
  }

  test("shards pack independently; every bin's first doc starts at 0") {
    import spark.implicits._
    val df = (0L until 40L).map(i => (i, 3L + i % 5))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packManifest(df, "doc_id", "n_tokens",
      budget = 16L, shards = 4).collect()
    out.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
      .foreach { case ((sh, bin), rows) =>
        val sorted = rows.sortBy(_.getAs[Long]("pos_in_bin"))
        assert(sorted.head.getAs[Long]("offset") == 0L,
          s"bin ($sh,$bin) first offset nonzero")
        // spans tile contiguously: each end is the next offset
        sorted.toSeq.sliding(2).foreach {
          case Seq(a, b) =>
            assert(a.getAs[Long]("end_offset") == b.getAs[Long]("offset"))
          case _ =>
        }
        assert(sorted.map(_.getAs[Long]("n_tokens")).sum ==
          sorted.head.getAs[Long]("bin_fill"))
      }
    // no doc lost or duplicated
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      (0L until 40L).toSeq)
  }
}
