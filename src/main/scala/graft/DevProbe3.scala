package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (optimization rounds): leg attribution for x63. */
object DevProbe3 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val dir = "/root/testdata/sf0.1"
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val mh = t("minhash pairs") {
        val mh = Dedup.minhashLsh(docs, "doc_id", "text",
          n = 4, numHashes = 8, numBands = 4)
          .filter(col("jaccard") >= 0.2).select("doc_a", "doc_b")
        mh.write.format("noop").mode("overwrite").save(); mh
      }
      val sh = t("simhash pairs") {
        val sh = Dedup.simhashNearDups(docs, "doc_id", "text",
          radius = 3, bands = 4).select("doc_a", "doc_b")
        sh.write.format("noop").mode("overwrite").save(); sh
      }
      val pairs = t("union distinct") {
        val p = mh.unionByName(sh).distinct()
        p.write.format("noop").mode("overwrite").save(); p
      }
      val comp = t("cc star") {
        Dedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
      }
      t("final join") {
        docs.join(comp, docs("doc_id") === comp("v"), "left")
          .select(col("doc_id"),
            (col("comp").isNull || col("comp") === col("doc_id")).as("kept"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
