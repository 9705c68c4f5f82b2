package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** latenessReport: replay collapse by batch id, per-batch micro shares,
  * and the -1 totals row (the ledger itself is 1 row per batch, so no
  * compactor exists — minimal by construction). */
class LatenessLedgerSpec extends SparkSpec {

  test("report collapses replays and totals correctly") {
    import spark.implicits._
    // batch 1's row appears twice (an at-least-once replay)
    val l = Seq(
      (0L, 100L, 500L, -1L, 0L),
      (1L, 50L, 600L, 500L, 10L),
      (1L, 50L, 600L, 500L, 10L))
      .toDF("batch_id", "n_rows", "batch_max_us", "wm_before_us",
        "late_rows")
    val out = EventStreams.latenessReport(l)
      .orderBy(col("batch_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq == Seq(
      (-1L, 150L, 10L, 66666L), // 10/150 in micro
      (0L, 100L, 0L, 0L),
      (1L, 50L, 10L, 200000L)))
  }

  test("replayed batch reproduces an identical row (wm from prior batches only)") {
    import spark.implicits._
    val ev = Seq(("2024-01-01 00:00:00", 1L), ("2024-01-01 02:00:00", 2L))
      .toDF("ts_s", "event_id")
      .select(col("ts_s").cast("timestamp").as("ts"), col("event_id"))
    val wh = java.nio.file.Paths.get(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val landing = wh.resolve("latereplay_landing")
    val ckptA = wh.resolve("_ck/latereplay_a")
    val ckptB = wh.resolve("_ck/latereplay_b")
    spark.sql("CREATE DATABASE IF NOT EXISTS latereplay")
    spark.sql("DROP TABLE IF EXISTS latereplay.ledger")
    for (p <- Seq(landing, ckptA, ckptB, wh.resolve("latereplay.db/ledger")))
      graft.engine.Materializer.deleteRecursively(p)
    ev.write.mode("overwrite").parquet(landing.toString)
    def run(ckpt: java.nio.file.Path): Unit =
      EventStreams.streamingLatenessLedger(spark, landing.toString,
        ev.schema, "latereplay.ledger", ckpt.toString, "ts",
        delaySeconds = 3600L)
    run(ckptA)
    // crash-after-append, commit lost: a fresh checkpoint re-delivers
    // batch 0 while the ledger already holds batch 0's earlier row —
    // the at-least-once replay the ledger family's convention covers
    run(ckptB)
    val rows = spark.table("latereplay.ledger").collect()
      .map(r => (r.getLong(r.fieldIndex("batch_id")),
        r.getLong(r.fieldIndex("n_rows")),
        r.getLong(r.fieldIndex("batch_max_us")),
        r.getLong(r.fieldIndex("wm_before_us")),
        r.getLong(r.fieldIndex("late_rows"))))
    assert(rows.length == 2)
    assert(rows.toSet.size == 1,
      s"replayed batch-0 row differs from the original: ${rows.toSeq}")
    assert(rows.head._4 == -1L) // wm excludes the batch's own prior row
  }
}
