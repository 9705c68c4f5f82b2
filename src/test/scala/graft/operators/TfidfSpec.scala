package graft.operators

import graft.SparkSpec

/** Tfidf.topTerms vs hand-computed smoothed tf·idf. */
class TfidfSpec extends SparkSpec {

  private def r4(x: Double) = BigDecimal(x)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scores, ranks and ties match hand computation") {
    import spark.implicits._
    // N = 3. "rare" appears in 1 doc (df 1), "common" in all 3 (df 3).
    val df = Seq(
      (1L, "rare common common"),
      (2L, "common shared"),
      (3L, "common shared")).toDF("doc_id", "text")
    val out = Tfidf.topTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val idf1 = math.log(4.0 / 2.0)  // df 1 → ln((3+1)/(1+1))
    val idf3 = math.log(4.0 / 4.0)  // df 3 → 0
    val idf2 = math.log(4.0 / 3.0)  // df 2
    // doc 1: rare 1·idf1 beats common 2·idf3 = 0
    assert(out(0) == (1L, 1L, "rare", r4(idf1)))
    assert(out(1) == (1L, 2L, "common", r4(2 * idf3)))
    // docs 2/3: shared 1·idf2 > common 1·0; ties by term name
    assert(out(2) == (2L, 1L, "shared", r4(idf2)))
    assert(out(3) == (2L, 2L, "common", 0.0))
    assert(out(4) == (3L, 1L, "shared", r4(idf2)))
  }

  test("k bounds output per doc; a doc with fewer terms emits fewer rows") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val out = Tfidf.topTerms(df, "doc_id", "text", k = 3).collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byDoc(1L) == 3 && byDoc(2L) == 1)
  }

  test("repeated terms accumulate tf, not duplicate rows") {
    import spark.implicits._
    val df = Seq((1L, "w w w only"), (2L, "other")).toDF("doc_id", "text")
    val top = Tfidf.topTerms(df, "doc_id", "text", k = 10)
      .filter(org.apache.spark.sql.functions.col("term") === "w")
      .collect()
    assert(top.length == 1)
    // tf 3, df 1, N 2 → 3·ln(3/2)
    assert(top.head.getDouble(3) == r4(3 * math.log(3.0 / 2.0)))
  }
}
