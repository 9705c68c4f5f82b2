package graft.probes

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (optimization rounds, test tree — not shipped): leg-level
  * wall attribution for the x121 audio-trim composition, so the round
  * optimizes the measured leg, not a guess. Run via
  * `tools/probe.sh graft.probes.AudioProbe`. */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Audio
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val spec = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"),
          element_at(typedlit(Seq(8000, 16000, 44100)),
            (col("doc_id") % 3).cast("int") + 1).as("rate"),
          (lit(600) + pmod(col("doc_id") * 7 + col("n_chars"), lit(800)))
            .cast("int").as("n"),
          (lit(500) + pmod(col("doc_id") * 13, lit(30)) * 1000)
            .cast("int").as("amp"),
          (lit(4) + pmod(col("doc_id"), lit(13))).cast("int").as("halfp"),
          (pmod(col("doc_id") * 3 + 1, lit(5)) * 80).cast("int").as("q"),
          (pmod(col("doc_id") * 7 + 2, lit(5)) * 40).cast("int").as("r"))
      val withSamples = spec.withColumn("samples", expr(
        """transform(sequence(0, n - 1), i ->
             CASE WHEN i < q OR i >= n - r THEN 0
                  WHEN ((i - q) div halfp) % 2 = 0 THEN amp
                  ELSE -amp END)"""))
      t("1 spec only") {
        spec.write.format("noop").mode("overwrite").save()
      }
      t("2 synth HOF (spec+samples)") {
        withSamples.write.format("noop").mode("overwrite").save()
      }
      val packed = Audio.packWav(spark, withSamples, "doc_id", "rate",
        "samples").toDF()
        .withColumn("payload", when(col("id") % 97 === 0,
          expr("substring(payload, 1, 6)")).otherwise(col("payload")))
      t("3 synth+packWav") {
        packed.write.format("noop").mode("overwrite").save()
      }
      val trimmed = Audio.trimSilence(spark, packed).toDF()
        .select(col("id"), col("trimmed"), col("n_in"), col("n_out"),
          col("lead_trimmed"), col("trail_trimmed"),
          col("duration_out_ms"), col("n_bytes"))
      t("4 synth+pack+trim (no sort)") {
        trimmed.write.format("noop").mode("overwrite").save()
      }
      t("5 full x121 (with sort)") {
        trimmed.orderBy(col("id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
