package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (optimization rounds): wall attribution inside the
  * two-AvailableNow-run streaming ledger shape (x161). */
object DevProbe2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.engine._
    import graft.streaming.EventStreams
    val dir = "/root/testdata/sf0.1"
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val docs = t("read docs") {
        spark.read.parquet(s"$dir/documents.parquet")
      }
      val split = t("split agg") {
        docs.agg(expr("(min(doc_id) + max(doc_id)) div 2")).first().getLong(0)
      }
      val wh = java.nio.file.Paths.get(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath)
      val landing = wh.resolve("strcdc_landing")
      val ckpt = wh.resolve("_graft_checkpoints/strcdc")
      t("cleanup") {
        spark.sql("CREATE DATABASE IF NOT EXISTS strcdc")
        spark.sql("DROP TABLE IF EXISTS strcdc.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("strcdc.db/ledger")))
          Materializer.deleteRecursively(p)
      }
      t("landing write 1") {
        docs.filter(col("doc_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
      }
      t("stream run 1") {
        EventStreams.streamingCdcDedupLedger(spark, landing.toString,
          docs.schema, "strcdc.ledger", ckpt.toString, "doc_id", "text")
      }
      t("landing write 2") {
        docs.filter(col("doc_id") > split)
          .write.mode("append").parquet(landing.toString)
      }
      t("stream run 2") {
        EventStreams.streamingCdcDedupLedger(spark, landing.toString,
          docs.schema, "strcdc.ledger", ckpt.toString, "doc_id", "text")
      }
      t("noop stream machinery") {
        val ck2 = wh.resolve("_graft_checkpoints/noopprobe" + pass)
        Materializer.deleteRecursively(ck2)
        val q = spark.readStream.schema(docs.schema)
          .parquet(landing.toString)
          .writeStream
          .option("checkpointLocation", ck2.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
            b.limit(1).count(): Unit
          })
          .start()
        try q.awaitTermination() finally q.stop()
      }
      t("final agg") {
        spark.table("strcdc.ledger")
          .groupBy(col("doc"))
          .agg(max(col("kept")).as("kept"))
          .withColumn("batch", when(col("doc") <= split, 1L).otherwise(2L))
          .select(col("doc").as("doc_id"), col("kept"), col("batch"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
