package graft.operators

import graft.SparkSpec

/** Chunking invariants: window coverage, overlap, suffix-dedup rule,
  * and reconstruction (every token appears in some chunk). */
class ChunkingSpec extends SparkSpec {

  test("windows cover every token once per stride; overlap is exact") {
    import spark.implicits._
    val text = (1 to 100).map(i => s"w$i").mkString(" ") // 100 tokens
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Chunking.chunkByTokens(df, "doc_id", "text",
      chunkTokens = 64, stride = 48)
      .orderBy("chunk_idx").collect()
    // starts 0, 48 (96 dropped: 96 + 16 >= 100 adds nothing new? no —
    // 96 + 16 = 112 >= 100, and chunk@48 covered through 111 > 99)
    assert(rows.length == 2, rows.mkString(";"))
    assert(rows(0).getAs[Long]("n_chunk_tokens") == 64L)
    assert(rows(1).getAs[Long]("n_chunk_tokens") == 52L) // 100 - 48
    val c0 = rows(0).getAs[String]("chunk_text").split(" ")
    val c1 = rows(1).getAs[String]("chunk_text").split(" ")
    assert(c0.head == "w1" && c0.last == "w64")
    assert(c1.head == "w49" && c1.last == "w100")
    // overlap tokens identical
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
  }

  test("short docs yield exactly one chunk; no redundant suffix windows") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"a$i").mkString(" ")),  // < chunk size
      (2L, (1 to 64).map(i => s"b$i").mkString(" ")),  // == chunk size
      (3L, (1 to 65).map(i => s"c$i").mkString(" ")))  // one past
      .toDF("doc_id", "text")
    val n = Chunking.chunkByTokens(df, "doc_id", "text", 64, 48)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 1L, 2L -> 1L, 3L -> 2L), n)
    // union of chunks reconstructs the token set
    val toks = Chunking.chunkByTokens(df, "doc_id", "text", 64, 48)
      .where($"doc_id" === 3L).collect()
      .flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(toks == (1 to 65).map(i => s"c$i").toSet)
  }
}
