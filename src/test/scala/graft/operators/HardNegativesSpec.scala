package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana cherry"),          // positive for query 1
    (2L, "apple apple banana x y z"),     // strong apple match
    (3L, "apple banana"),                 // short: high per-term weight
    (4L, "unrelated words only here"),
    (5L, "banana pear pear pear"))
    .toDF("doc_id", "text")

  private def queries(qs: (Long, Seq[String])*) =
    qs.toDF("query_id", "terms")

  test("positives are excluded; ranks follow score desc, doc_id ties") {
    val out = HardNegatives.mine(docs, "doc_id", "text",
      queries(1L -> Seq("apple", "banana")), topK = 10)
      .collect().sortBy(_.getLong(1))
    assert(out.forall(_.getLong(0) == 1L))
    assert(!out.map(_.getLong(2)).contains(1L), "positive leaked in")
    // candidates: docs 2, 3, 5 (4 has no query terms)
    assert(out.map(_.getLong(2)).toSet == Set(2L, 3L, 5L))
    // independent reference: textbook BM25 with the operator's params
    val toks = Map(2L -> "apple apple banana x y z", 3L -> "apple banana",
      5L -> "banana pear pear pear", 1L -> "apple banana cherry",
      4L -> "unrelated words only here")
      .view.mapValues(_.split(" ").toSeq).toMap
    val n = toks.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def score(id: Long, terms: Seq[String]): Double = {
      val c = terms.flatMap { t =>
        val tf = toks(id).count(_ == t)
        if (tf == 0) None else {
          val df = toks.values.count(_.contains(t))
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
          Some(BigDecimal.valueOf(idf * tf * 2.2 /
            (tf + 1.2 * (0.25 + 0.75 * toks(id).size / avgdl)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        }
      }.sum
      BigDecimal.valueOf(c.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = Seq(2L, 3L, 5L)
      .map(id => id -> score(id, Seq("apple", "banana")))
      .sortBy { case (id, s) => (-s, id) }
    assert(out.map(r => r.getLong(2) -> r.getDouble(4)).toSeq == want)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }

  test("multi-query: shared terms count once, per-query ranking") {
    val out = HardNegatives.mine(docs, "doc_id", "text",
      queries(1L -> Seq("apple"), 5L -> Seq("banana", "pear")),
      topK = 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq)
      .toMap
    // query 1 (apple): candidates 2, 3 — doc 3's length normalization
    // (dl 2 vs 6) outweighs doc 2's tf 2, the classic BM25 trade
    assert(out(1L) == Seq(3L, 2L))
    // query 5 (banana, pear): positive 5 excluded; candidates 1, 2, 3
    assert(out(5L).size == 2 && !out(5L).contains(5L))
  }

  test("two-phase top-k equals a single global ranking") {
    // 60 docs that all match; salts > docs exercises sparse cells
    val many = (10L until 70L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("t").mkString(" ") +
        " filler" + i))
      .toDF("doc_id", "text")
    val a = HardNegatives.mine(many, "doc_id", "text",
      queries(999L -> Seq("t")), topK = 5, salts = 97).collect()
    val b = HardNegatives.mine(many, "doc_id", "text",
      queries(999L -> Seq("t")), topK = 5, salts = 1).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    assert(a.length == 5)
  }
}
