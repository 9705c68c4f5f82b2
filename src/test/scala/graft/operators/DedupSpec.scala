package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("connectedComponents: transitive clusters get the min-id label") {
    import spark.implicits._
    // two chains (1-2-3-4, 10-11) and one triangle sharing a vertex (20s)
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L))
      .toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("connectedComponents: long path converges within diameter rounds") {
    import spark.implicits._
    val n = 30L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b", maxRounds = 40)
    assert(comp.select(countDistinct(col("comp"))).first().getLong(0) == 1L)
    assert(comp.agg(min(col("comp")), max(col("comp"))).first()
      .toSeq == Seq(1L, 1L))
    assert(comp.count() == n)
  }

  test("native profileScores equals the HOF profileScore per profile") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val texts = Seq("the le la de und", "el el la y", "", "zzz qqq")
      .toDF("text")
    val native = texts.withColumn("sc", graft.expressions.TextExpressions
      .profileScores(col("text"), langProfiles.map(_._2)))
    val both = langProfiles.zipWithIndex.foldLeft(
      native.withColumn("toks", tokens(col("text")))) {
      case (d, ((lang, words), i)) =>
        d.withColumn(s"n_$lang", element_at(col("sc"), i + 1))
          .withColumn(s"h_$lang", profileScore(col("toks"), words))
    }
    langProfiles.foreach { case (lang, _) =>
      assert(both.filter(col(s"n_$lang") =!= col(s"h_$lang")).isEmpty,
        s"native != HOF for $lang")
    }
  }

  test("langPredict: argmax with declared-order tie-break and unk floor") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Seq(
      "the cat and the hat",        // en dominant
      "el la de que y la el",       // es dominant
      "xyz qqq zzz",                // no profile word -> unk
      "the le")                     // en==fr tie -> first declared (en)
      .toDF("text").withColumn("toks", tokens(col("text")))
    val scored = langProfiles.foldLeft(df) { case (d, (l, ws)) =>
      d.withColumn(s"c_$l", profileScore(col("toks"), ws))
    }
    val out = scored.select(
      langPredict(langProfiles.map { case (l, _) => l -> col(s"c_$l") }))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "es", "unk", "en"))
  }
}
