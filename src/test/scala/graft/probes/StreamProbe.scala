package graft.probes

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (optimization rounds, test tree): leg-level wall attribution
  * for the streaming-ledger query shape (x58-class) — landing writes,
  * each AvailableNow run, the merged read — plus a NO-OP-step streaming
  * run to isolate the machinery floor. Run via
  * `tools/probe.sh graft.probes.StreamProbe`. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.engine._
    import graft.streaming.EventStreams
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val wh = java.nio.file.Paths.get(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      // ---- machinery floor: AvailableNow run whose foreachBatch is a no-op
      val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
      t("0 noop-stream floor (1 run, tiny landing)") {
        val landing = wh.resolve("probe_noop_landing")
        val ckpt = wh.resolve("_graft_checkpoints/probe_noop")
        Materializer.deleteRecursively(landing)
        Materializer.deleteRecursively(ckpt)
        docsAll.limit(10).write.mode("overwrite").parquet(landing.toString)
        val stream = spark.readStream.schema(docsAll.schema)
          .parquet(landing.toString)
        val q = stream.writeStream
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => { b.count(); () })
          .start()
        try q.awaitTermination() finally q.stop()
      }
      // ---- x58 legs
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val split = t("1 split agg") {
        docs.agg(expr("(min(doc_id) + max(doc_id)) div 2")).first().getLong(0)
      }
      val landing = wh.resolve("strldg_landing")
      val ckpt = wh.resolve("_graft_checkpoints/strldg")
      spark.sql("CREATE DATABASE IF NOT EXISTS strldg")
      spark.sql("DROP TABLE IF EXISTS strldg.ledger")
      for (p <- Seq(landing, ckpt, wh.resolve("strldg.db/ledger")))
        Materializer.deleteRecursively(p)
      t("2 landing write 1") {
        docs.filter(col("doc_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
      }
      t("3 AvailableNow run 1 (dedup step)") {
        EventStreams.streamingDedupLedger(spark, landing.toString,
          docs.schema, "strldg.ledger", ckpt.toString, "doc_id", "text")
      }
      t("4 landing write 2") {
        docs.filter(col("doc_id") > split)
          .write.mode("append").parquet(landing.toString)
      }
      t("5 AvailableNow run 2") {
        EventStreams.streamingDedupLedger(spark, landing.toString,
          docs.schema, "strldg.ledger", ckpt.toString, "doc_id", "text")
      }
      t("6 merged read + noop") {
        spark.table("strldg.ledger")
          .groupBy(col("doc"))
          .agg(max(col("kept")).as("kept"))
          .withColumn("batch",
            when(col("doc") <= split, 1L).otherwise(2L))
          .select(col("doc").as("doc_id"), col("kept"), col("batch"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
      // landing file counts (guide §6 evidence)
      val nFiles = java.nio.file.Files.list(landing).filter(
        p => p.toString.endsWith(".parquet")).count()
      println(s"[probe] landing part files: $nFiles")
      // ---- batch-equivalent of ONE run's step, outside streaming, to
      // separate step compute from machinery
      t("7 batch twin of run-1 step (compute only)") {
        import graft.operators.Dedup
        val batch = docs.filter(col("doc_id") <= split)
        val kept = Dedup.minhashBandPostings(batch.limit(0), "doc_id", "text")
        Dedup.dedupBatchLedger(batch, kept, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
