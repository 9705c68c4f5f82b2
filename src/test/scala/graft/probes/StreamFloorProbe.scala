package graft.probes

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose the AvailableNow machinery floor — start(),
  * awaitTermination(), stop(), per-batch — for a no-op foreachBatch
  * over a tiny landing dir, run TWICE on one checkpoint (the x58
  * two-run shape). Run via `tools/probe.sh graft.probes.StreamFloorProbe`. */
object StreamFloorProbe {
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
    def ms(t0: Long): String = f"${(System.nanoTime() - t0) / 1e6}%.0f ms"
    val wh = java.nio.file.Paths.get(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
    for (pass <- 1 to 3) {
      println(s"--- pass $pass")
      val landing = wh.resolve("probe_floor_landing")
      val ckpt = wh.resolve("_graft_checkpoints/probe_floor")
      Materializer.deleteRecursively(landing)
      Materializer.deleteRecursively(ckpt)
      docsAll.limit(10).write.mode("overwrite").parquet(landing.toString)
      for (run <- 1 to 2) {
        if (run == 2)
          docsAll.limit(10).write.mode("append").parquet(landing.toString)
        val batches = new java.util.concurrent.atomic.AtomicInteger(0)
        var tBatch0 = 0L
        val stream = spark.readStream.schema(docsAll.schema)
          .parquet(landing.toString)
        var t0 = System.nanoTime()
        val q = stream.writeStream
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => {
            if (batches.getAndIncrement() == 0) tBatch0 = System.nanoTime()
            val t = System.nanoTime()
            b.count()
            println(s"[floor] run $run batch $id body ${ms(t)}")
          })
          .start()
        println(s"[floor] run $run start() ${ms(t0)}")
        t0 = System.nanoTime()
        try q.awaitTermination() finally {
          println(s"[floor] run $run await ${ms(t0)}; batches=${batches.get()}")
          t0 = System.nanoTime()
          q.stop()
          println(s"[floor] run $run stop() ${ms(t0)}")
        }
      }
    }
    spark.stop()
  }
}
