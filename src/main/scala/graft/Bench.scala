package graft
import org.apache.spark.sql.SparkSession
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
    // min over `runs` passes: a shared host can stall any one pass by
    // 10-100x (observed — the inflated queries differ run to run), and the
    // min is the measurement least polluted by co-tenant noise.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val results = selected.map { case (name, fn) =>
      // failed passes measure nothing: score them +inf so a fast crash
      // can't become the reported best time; all-passes-failed -> -1
      val best = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Double.PositiveInfinity
        }
      }.min
      val sec = if (best.isFinite) best else -1.0
      System.err.println(f"[bench] $name $sec%.2f s")
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
