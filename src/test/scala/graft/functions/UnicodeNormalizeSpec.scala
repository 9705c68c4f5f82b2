package graft.functions

import graft.SparkSpec
import graft.expressions.TextExpressions.{normalizeText, stripAccents}
import org.apache.spark.sql.functions._

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  // build the variants from explicit code points — visually identical
  // literals in source would be unverifiable
  private val eAcute = "\u00e9"     // composed e-acute
  private val combAcute = "\u0301"  // combining acute
  private val composed = s"caf$eAcute"
  private val decomposed = s"cafe$combAcute"

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("t").select(c.as("r")).as[String].head()

  test("NFC converges composed and decomposed spellings") {
    assert(composed != decomposed && composed.length == 4 &&
      decomposed.length == 5)
    assert(one(normalizeText(col("t")), composed) == composed)
    assert(one(normalizeText(col("t")), decomposed) == composed)
    // NFD goes the other way
    assert(one(normalizeText(col("t"), "NFD"), composed) == decomposed)
  }

  test("NFKC folds compatibility characters") {
    // fi ligature (U+FB01) -> "fi"; fullwidth A (U+FF21) -> "A"
    assert(one(normalizeText(col("t"), "NFKC"), "ﬁle Ａ")
      == "file A")
    // but NFC preserves the ligature
    assert(one(normalizeText(col("t"), "NFC"), "ﬁle") == "ﬁle")
  }

  test("stripAccents folds Latin diacritics, keeps base letters") {
    assert(one(stripAccents(col("t")),
      "á é ñ ü ç") == "a e n u c")
    // idempotent on ASCII
    assert(one(stripAccents(col("t")), "plain ascii") == "plain ascii")
    // works on decomposed input too
    assert(one(stripAccents(col("t")), decomposed) == "cafe")
  }

  test("SQL registration: normalize_text / strip_accents callable from SQL") {
    graft.expressions.GraftFunctions.register(spark)
    // NB: Spark's chr() wraps at 256 (chr(769) = chr(1)), unlike
    // DuckDB's codepoint chr() — so inject the decomposed string itself
    val r = spark.sql(
      s"SELECT strip_accents(normalize_text('$decomposed')) AS a, " +
      "normalize_text('Ａ', 'NFKC') AS b").as[(String, String)].head()
    assert(r == ("cafe", "A"), r.toString)
  }

  test("null-safe and dedup-relevant: variants hash identically after NFC") {
    val df = Seq(Tuple1(composed), Tuple1(decomposed)).toDF("t")
    val hashes = df.select(md5(normalizeText(col("t"))).as("h"))
      .distinct().count()
    assert(hashes == 1, "composed and decomposed must dedup after NFC")
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(normalizeText(col("t"))).head().get(0)
    assert(n == null)
  }
}
