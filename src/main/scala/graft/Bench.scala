package graft
import org.apache.spark.sql.SparkSession
import java.util.Locale

/** Benchmark main. Prints ONE full JSON line (queries detail) followed by a
  * compact total-only JSON line, and writes the full line to
  * `target/bench.json` so the record survives any stdout truncation.
  *
  * Passes are INTERLEAVED: we sweep every query once, then sweep again, and
  * take the per-query min across sweeps. On this host the Firecracker
  * hypervisor deschedules the guest for ~20-minute windows (documented in
  * BASELINE.md); back-to-back passes of one query can both land inside a
  * window, but two passes separated by a full sweep (~1 min+) rarely do.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer init otherwise lands
    // entirely on the first measured query
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .limit(1000).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink: forces full evaluation of every output column (count()
    // would let Catalyst prune the very projections being measured).
    // Optional comma-separated query-name filter for local iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    // min across interleaved sweeps; a failed pass measures nothing (+inf)
    // so a fast crash can't become the reported best time.
    val best = Array.fill(selected.size)(Double.PositiveInfinity)
    for (pass <- 1 to runs; ((name, fn), i) <- selected.zipWithIndex) {
      val t0 = System.nanoTime()
      val sec =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed (pass $pass): ${e.getMessage}")
          Double.PositiveInfinity
        }
      best(i) = math.min(best(i), sec)
      System.err.println(f"[bench] pass $pass $name $sec%.2f s")
    }
    def fmt(v: Double): String =
      if (v.isFinite) String.format(Locale.ROOT, "%.3f", Double.box(v)) else "-1"
    val results = selected.map(_._1).zip(best.toSeq)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_.isFinite).sum
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs}"""
    // durable copy first: stdout has historically been truncated by the
    // driver's tail buffer (BENCH_r01/r02 "parsed": null)
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    println(full)
    // compact fallback line: still valid on its own if the full line's head
    // is clipped from the tail buffer
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","runs":$runs}""")
    spark.stop()
  }
}
