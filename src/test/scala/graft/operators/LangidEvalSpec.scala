package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangidEvalSpec extends SparkSpec {
  import spark.implicits._

  test("confusion cells, fractions and correctness flags are exact") {
    val docs = Seq(
      (1L, "en", "the cat of the house"),     // en → en
      (2L, "en", "xyz qqq zzz"),              // en → unk
      (3L, "en", "the dog"),                  // en → en
      (4L, "es", "el perro de la casa"),      // es scores 3, fr 2 → es
      (5L, "de", "der hund und das haus"))    // de → de
      .toDF("doc_id", "lang", "text")
    val out = LangidEval.confusion(docs, "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(("en", "en")) == ((2L, 0.666667, true)))
    assert(out(("en", "unk")) == ((1L, 0.333333, false)))
    assert(out(("es", "es")) == ((1L, 1.0, true)))
    assert(out(("de", "de")) == ((1L, 1.0, true)))
    assert(out.size == 4)
  }

  test("uncovered labels surface as misrouted rows, never vanish") {
    val docs = Seq((1L, "zh", "the zh text uses english stopwords"))
      .toDF("doc_id", "lang", "text")
    val out = LangidEval.confusion(docs, "lang", "text").collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "zh" &&
      out.head.getString(1) == "en" && !out.head.getBoolean(4))
  }

  test("fractions are per-label, summing to 1 within each label") {
    val docs = (0L until 64L).map(i =>
      (i, "fr", if (i < 58) "le chat de la maison" else "no hits here"))
      .toDF("doc_id", "lang", "text")
    val fr = LangidEval.confusion(docs, "lang", "text").collect()
    // 58/64 = 0.90625 is DYADIC — the case integer micro-rounding exists
    // for; frac must come out exactly, not one ulp under
    val byPred = fr.map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(byPred("fr") == 0.90625)
    assert(byPred("unk") == 0.09375)
  }
}
