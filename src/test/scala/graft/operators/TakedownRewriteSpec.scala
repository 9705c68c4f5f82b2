package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TakedownRewrite: ids gone, counts right, untouched shards BYTE-
  * identical on disk (real content hashing, not just mtime), the
  * fully-taken-down-shard edge (dynamic overwrite writes nothing for
  * it — the explicit partition drop must fire), and idempotence. */
class TakedownRewriteSpec extends SparkSpec {

  private def fileHashes(dir: java.nio.file.Path): Map[String, String] = {
    if (!java.nio.file.Files.exists(dir)) return Map.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filterNot(_.getFileName.toString.startsWith("."))
      .map(p => dir.relativize(p).toString ->
        md.digest(java.nio.file.Files.readAllBytes(p))
          .map("%02x".format(_)).mkString)
      .toMap
  }

  private def freshTable(name: String, rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    val wh = java.nio.file.Paths.get(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    spark.sql("CREATE DATABASE IF NOT EXISTS tkdnspec")
    spark.sql(s"DROP TABLE IF EXISTS tkdnspec.$name")
    graft.engine.Materializer.deleteRecursively(
      wh.resolve(s"tkdnspec.db/$name"))
    rows.toDF("doc_id", "source", "shard")
      .write.partitionBy("shard").format("parquet")
      .saveAsTable(s"tkdnspec.$name")
    wh.resolve(s"tkdnspec.db/$name")
  }

  // ids 1..12 over shards 0..3 (id % 4); takedown hits ids 5, 9 (shard 1)
  private val corpus = (1L to 12L).map(i => (i, s"s$i", i % 4))

  test("untouched shards stay byte-identical; touched lose exactly the ids") {
    import spark.implicits._
    val root = freshTable("t1", corpus)
    val pre = fileHashes(root)
    val report = TakedownRewrite.rewriteShards(spark, "tkdnspec.t1",
      Seq(5L, 9L).toDF("doc_id"), "doc_id", "shard")
      .orderBy(col("shard").cast("long")).collect()
    val post = fileHashes(root)
    // byte identity for every file outside shard=1
    val preOther = pre.filterNot(_._1.contains("shard=1"))
    val postOther = post.filterNot(_._1.contains("shard=1"))
    assert(preOther == postOther,
      s"untouched shard files changed: ${preOther.keySet.diff(postOther.keySet)} / ${postOther.keySet.diff(preOther.keySet)}")
    // shard=1 DID change (the rewrite really happened)
    assert(pre.filter(_._1.contains("shard=1")) !=
      post.filter(_._1.contains("shard=1")))
    // report: shard 1 rewritten, 3 -> 1 docs; others untouched
    val bysh = report.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
        r.getBoolean(5), r.getBoolean(6))).toMap
    assert(bysh("1") == ((3L, 2L, 1L, true, true, true)), bysh("1"))
    assert(bysh("0") == ((3L, 0L, 3L, false, true, true)), bysh("0"))
    // ids really gone from the table
    assert(spark.table("tkdnspec.t1")
      .filter(col("doc_id").isin(5L, 9L)).count() == 0)
    assert(spark.table("tkdnspec.t1").count() == 10)
  }

  test("fully-taken-down shard is dropped, not silently kept") {
    import spark.implicits._
    freshTable("t2", corpus)
    // shard 2 holds ids 2, 6, 10 — delete all of them
    val report = TakedownRewrite.rewriteShards(spark, "tkdnspec.t2",
      Seq(2L, 6L, 10L).toDF("doc_id"), "doc_id", "shard")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getBoolean(5))).toMap
    assert(report("2") == ((0L, true)), report("2"))
    assert(spark.table("tkdnspec.t2").filter(col("shard") === 2).count() == 0)
    assert(spark.table("tkdnspec.t2").count() == 9)
  }

  test("idempotent: re-applying the same takedown rewrites nothing") {
    import spark.implicits._
    val root = freshTable("t3", corpus)
    val del = Seq(5L, 9L).toDF("doc_id")
    TakedownRewrite.rewriteShards(spark, "tkdnspec.t3", del,
      "doc_id", "shard").collect()
    val mid = fileHashes(root)
    val second = TakedownRewrite.rewriteShards(spark, "tkdnspec.t3", del,
      "doc_id", "shard").collect()
    assert(fileHashes(root) == mid, "second apply touched files")
    assert(second.forall(r => !r.getBoolean(4)), second.toSeq) // rewritten
    assert(second.forall(r => r.getBoolean(6)), second.toSeq) // intact
  }
}
