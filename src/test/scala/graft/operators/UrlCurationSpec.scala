package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization + domain-stat invariants beyond the oracle hash:
  * every messy variant collapses to one normal form, ports and paths
  * never leak into the domain, and the cap verdict is the deterministic
  * md5-rank selection. */
class UrlCurationSpec extends SparkSpec {

  test("canonicalization collapses scheme/case/www/query/fragment/slash variants") {
    import spark.implicits._
    val variants = Seq(
      "https://www.Example.COM/A/b?q=1#frag",
      "HTTP://example.com/a/b/",
      "example.com/a/b",
      "ftp://WWW.EXAMPLE.com/a/b?x=2",
      "https://example.com/a/b///")
    val out = variants.toDF("url")
      .select(UrlCuration.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("example.com/a/b"), out)
  }

  test("domainOf strips path and port; www inside the path survives") {
    import spark.implicits._
    val rows = Seq(
      "https://example.com:8080/path",
      "https://sub.example.com/www.fake.com/page",
      "example.com")
      .toDF("url")
      .select(UrlCuration.domainOf(UrlCuration.canonicalUrl(col("url"))).as("d"))
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("example.com", "sub.example.com", "example.com"), rows)
  }

  test("domainStats: counts, dup ratio, and the md5-rank cap selection") {
    import spark.implicits._
    // one domain with 3 docs (2 identical texts, 2 urls collapse), capped
    // at 2; the expected kept set replicates capPerGroup's hash order
    val df = Seq(
      (1L, "https://www.a.com/x", "same text"),
      (2L, "https://a.com/x?utm=1", "same text"),
      (3L, "a.com/y", "other text"),
      (4L, "https://b.com/z", "b text"))
      .toDF("doc_id", "url", "text")
    val got = UrlCuration.domainStats(df, "url", "text", "doc_id", capN = 2)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    val aKept = Seq(1L, 2L, 3L)
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString, id))
      .take(2).sum
    assert(got.toSeq == Seq(
      ("a.com", 3L, 2L, 0.3333, 2L, aKept),
      ("b.com", 1L, 1L, 0.0, 1L, 4L)), got.toSeq)
  }

  test("working-column clash guard") {
    import spark.implicits._
    val df = Seq((1L, "a.com/x", "t", "boom")).toDF("doc_id", "url", "text", "domain")
    val e = intercept[IllegalArgumentException] {
      UrlCuration.domainStats(df, "url", "text", "doc_id", 2)
    }
    assert(e.getMessage.contains("domain"))
  }
}
