package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** streamingSuppressionLedger: offset-log cursor, idempotent reads,
  * batch-report equality. */
class SuppressionLedgerSpec extends SparkSpec {

  test("run 2 appends only new request files; suppressionSet collapses replays") {
    import spark.implicits._
    val landing = java.nio.file.Files.createTempDirectory("supldg_t").toString
    val ckpt = java.nio.file.Files.createTempDirectory("supldg_ck").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS supldgt")
    spark.sql("DROP TABLE IF EXISTS supldgt.ledger")
    Seq(1L, 2L, 3L).toDF("doc_id").write.mode("overwrite").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    EventStreams.streamingSuppressionLedger(
      spark, landing, schema, "supldgt.ledger", ckpt, "doc_id")
    assert(spark.table("supldgt.ledger").count() == 3)

    // drop 2: one NEW id plus a re-request of id 2 (idempotent by id)
    Seq(2L, 9L).toDF("doc_id").write.mode("append").parquet(landing)
    EventStreams.streamingSuppressionLedger(
      spark, landing, schema, "supldgt.ledger", ckpt, "doc_id")
    // run 2 appended exactly the second drop's rows — run-1 files never
    // re-read (5 total, not 8)
    assert(spark.table("supldgt.ledger").count() == 5)

    // a third run with no new files appends nothing
    EventStreams.streamingSuppressionLedger(
      spark, landing, schema, "supldgt.ledger", ckpt, "doc_id")
    assert(spark.table("supldgt.ledger").count() == 5)

    val sup = EventStreams.suppressionSet(
      spark.table("supldgt.ledger"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sup.keySet == Set(1L, 2L, 3L, 9L))
    // id 2's audit trail keeps its FIRST asserting batch
    assert(sup(2L) == sup(1L), "re-requested id keeps first batch")
    assert(sup(9L) > sup(1L), "new id carries the later batch")
  }

  test("impact report over the cumulative set equals the one-shot batch report") {
    import spark.implicits._
    val landing = java.nio.file.Files.createTempDirectory("supldg2_t").toString
    val ckpt = java.nio.file.Files.createTempDirectory("supldg2_ck").toString
    spark.sql("CREATE DATABASE IF NOT EXISTS supldgt")
    spark.sql("DROP TABLE IF EXISTS supldgt.ledger2")
    val assigned = Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 1L, 30L),
      (4L, 1L, 40L)).toDF("doc_id", "shard", "n_bytes")
    Seq(1L).toDF("doc_id").write.mode("overwrite").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    EventStreams.streamingSuppressionLedger(
      spark, landing, schema, "supldgt.ledger2", ckpt, "doc_id")
    Seq(3L).toDF("doc_id").write.mode("append").parquet(landing)
    EventStreams.streamingSuppressionLedger(
      spark, landing, schema, "supldgt.ledger2", ckpt, "doc_id")
    val streamed = graft.operators.DeletionImpact.report(assigned,
      EventStreams.suppressionSet(spark.table("supldgt.ledger2"), "doc_id"),
      "doc_id", "shard", "n_bytes").orderBy("shard").collect()
    val oneShot = graft.operators.DeletionImpact.report(assigned,
      Seq(1L, 3L).toDF("doc_id"),
      "doc_id", "shard", "n_bytes").orderBy("shard").collect()
    assert(streamed.map(_.toString).toSeq == oneShot.map(_.toString).toSeq)
  }
}
