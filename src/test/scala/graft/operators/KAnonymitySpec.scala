package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KAnonymity.classReport vs hand-computed classes. */
class KAnonymitySpec extends SparkSpec {

  test("classes, flags and shares match hand computation") {
    import spark.implicits._
    val df = Seq(
      ("web", "en"), ("web", "en"), ("web", "en"),
      ("web", "de"), ("book", "en")).toDF("src", "lang")
    val out = KAnonymity.classReport(df,
      Seq("src" -> col("src"), "lang" -> col("lang")), k = 2L)
      .orderBy("src", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4)))
    assert(out(0) == ("book", "en", 1L, false, 0.2))
    assert(out(1) == ("web", "de", 1L, false, 0.2))
    assert(out(2) == ("web", "en", 3L, true, 0.6))
  }

  test("k = 1 marks everything anonymous; shares sum to 1") {
    import spark.implicits._
    val df = (1 to 7).map(i => (s"s${i % 3}", i)).toDF("src", "x")
    val rows = KAnonymity.classReport(df,
      Seq("src" -> col("src")), k = 1L).collect()
    assert(rows.forall(_.getBoolean(2)))
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) <= rows.length * 1e-6)
  }

  test("duplicate quasi names and invalid k refused") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("src", "x")
    intercept[IllegalArgumentException] {
      KAnonymity.classReport(df,
        Seq("s" -> col("src"), "s" -> col("src")), k = 2L)
    }
    intercept[IllegalArgumentException] {
      KAnonymity.classReport(df, Seq("s" -> col("src")), k = 0L)
    }
  }

  test("l-diversity: the homogeneity attack k-anonymity misses") {
    import spark.implicits._
    // class A is 4-anonymous AND 2-diverse (x,x,x,y — top share 75%);
    // class B is 3-anonymous but HOMOGENEOUS (top share 100%)
    val df = Seq(("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "z"), ("B", "z"), ("B", "z")).toDF("cls", "diag")
    val out = KAnonymity.lDiversityReport(df,
        Seq("cls" -> col("cls")), "diag" -> col("diag"), l = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(out == Map(
      "A" -> ((4L, 2L, true, 750000L)),
      "B" -> ((3L, 1L, false, 1000000L))), out)
  }

  test("l-diversity validation: sensitive-as-quasi, bad l") {
    import spark.implicits._
    val df = Seq(("a", "s")).toDF("q", "v")
    intercept[IllegalArgumentException] {
      KAnonymity.lDiversityReport(df, Seq("q" -> col("q")),
        "q" -> col("v"), l = 2L)
    }
    intercept[IllegalArgumentException] {
      KAnonymity.lDiversityReport(df, Seq("q" -> col("q")),
        "v" -> col("v"), l = 0L)
    }
  }
}
