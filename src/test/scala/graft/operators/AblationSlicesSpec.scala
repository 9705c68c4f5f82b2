package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AblationSlices.nestedCounts: nesting, totals, validation. */
class AblationSlicesSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (0L until 400L).map(i => (i, s"w$i x y z", s"s${i % 2}"))
      .toDF("doc_id", "text", "source")
  }

  test("cumulative counts are monotone per source and p=1000 equals the total") {
    val out = AblationSlices.nestedCounts(corpus, "doc_id", "text",
      "source", Seq(100, 250, 500, 1000)).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, d1, t1), (_, _, d2, t2)) =>
          assert(d2 >= d1 && t2 >= t1, s"$src not monotone")
        case _ =>
      }
      val (_, p, d, t) = sorted.last
      assert(p == 1000L && d == 200L && t == 200L * 4,
        s"$src full subset ($p, $d, $t)")
    }
  }

  test("membership is by hash threshold: counts match a direct filter") {
    val out = AblationSlices.nestedCounts(corpus, "doc_id", "text",
      "source", Seq(250, 1000)).collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    val direct = corpus
      .withColumn("f",
        conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
          .cast("long"))
      .filter(col("f") < (250L * (1L << 24) / 1000L))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (src, n) =>
      assert(out.getOrElse((src, 250L), 0L) == n, s"$src: $out vs $n")
    }
  }

  test("thresholds validated: unsorted, duplicate, out-of-range refused") {
    intercept[IllegalArgumentException] {
      AblationSlices.nestedCounts(corpus, "doc_id", "text", "source",
        Seq(500, 100))
    }
    intercept[IllegalArgumentException] {
      AblationSlices.nestedCounts(corpus, "doc_id", "text", "source",
        Seq(100, 100))
    }
    intercept[IllegalArgumentException] {
      AblationSlices.nestedCounts(corpus, "doc_id", "text", "source",
        Seq(0, 100))
    }
    intercept[IllegalArgumentException] {
      AblationSlices.nestedCounts(corpus, "doc_id", "text", "source",
        Seq(100, 1001))
    }
  }
}
