package graft.operators

import graft.SparkSpec
import graft.expressions.SketchExpressions
import org.apache.spark.sql.functions._

/** Misra-Gries sketch properties against exact counts on a seeded skewed
  * stream, plus merge-order independence and the report verdicts. */
class HeavyHittersSpec extends SparkSpec {

  /** Zipf-ish fixture: hot term i (1..10) appears 2^i * 3 times; 400
    * unique tail terms appear once each. Deterministic interleave. */
  private def fixture(): Seq[String] = {
    val hot = (1 to 10).flatMap(i => Seq.fill((1 << i) * 3)(s"hot$i"))
    val tail = (0 until 400).map(i => s"tail$i")
    val all = hot ++ tail
    // fixed-seed shuffle so partition contents are stable across runs
    new scala.util.Random(11).shuffle(all)
  }

  private def sketchOf(terms: Seq[String], parts: Int, capacity: Int) = {
    import spark.implicits._
    terms.toDF("term").repartition(parts)
      .agg(SketchExpressions.misraGriesTopK(col("term"), capacity))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
  }

  test("every qualifying term survives with estimate inside the MG bounds") {
    val terms = fixture()
    val n = terms.size.toLong
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (m <- Seq(16, 64)) {
      val sk = sketchOf(terms, parts = 4, capacity = m).toMap
      val errBound = n.toDouble / (m + 1)
      exact.foreach { case (t, f) =>
        if (f > errBound) {
          assert(sk.contains(t), s"qualifying $t (f=$f, bound=$errBound) evicted")
          assert(sk(t) <= f && (f - sk(t)) <= errBound,
            s"$t est=${sk(t)} outside [${f - errBound}, $f]")
        }
      }
      // every estimate is an undercount of a REAL term's frequency
      sk.foreach { case (t, est) =>
        assert(exact.contains(t) && est <= exact(t), s"phantom/overcount $t")
      }
    }
  }

  test("merge is order-independent: identical summary at 1, 4, 16 partitions") {
    val terms = fixture()
    val one = sketchOf(terms, 1, 32)
    // single-partition run obeys the per-partition capacity bound exactly
    assert(one.size <= 32, s"capacity exceeded: ${one.size}")
    val four = sketchOf(terms, 4, 32)
    assert(four == sketchOf(terms, 4, 32), "same plan, different summary")
    assert(sketchOf(terms, 16, 32).toMap.keySet.nonEmpty)
    // across partition counts the SUMMARIES legitimately differ (different
    // local streams), but both must satisfy the global guarantee
    val n = terms.size.toLong
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (sk <- Seq(one.toMap, four.toMap)) {
      exact.foreach { case (t, f) =>
        if (f > n.toDouble / 33) assert(sk.contains(t), s"$t missing")
      }
    }
  }

  test("report: exact top-k, all verdicts true, integer-exact qualify line") {
    import spark.implicits._
    val df = fixture().toDF("term").repartition(4)
    val rows = HeavyHitters.report(df, "term", capacity = 16, topK = 5)
      .collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("hot10", "hot9", "hot8", "hot7", "hot6"))
    assert(rows.map(_.getLong(1)).toSeq ==
      Seq(3072L, 1536L, 768L, 384L, 192L))
    assert(rows.forall(_.getBoolean(3)), "sketch_ok must hold everywhere")
    val n = fixture().size.toLong
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(1) * 17 > n))
    }
  }

  test("report: non-qualifying terms absent from a tiny sketch stay ok") {
    import spark.implicits._
    val df = fixture().toDF("term").repartition(4)
    // capacity 2 -> only hot10 (3072 > n/3) qualifies; lower top-5 terms
    // may be missing from the summary entirely (null estimate path) and
    // must still report sketch_ok = true because they never qualified
    val rows = HeavyHitters.report(df, "term", capacity = 2, topK = 5)
      .collect()
    assert(rows.forall(_.getBoolean(3)), rows.mkString(", "))
    assert(rows.count(_.getBoolean(2)) == 1, "exactly hot10 qualifies")
  }

  test("misra_gries_topk is callable from SQL after registration") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    fixture().toDF("term").createOrReplaceTempView("hh_sql")
    val top = spark.sql(
      """SELECT misra_gries_topk(term, 8) AS sk FROM hh_sql""")
      .selectExpr("sk[0].term", "sk[0].est").collect().head
    assert(top.getString(0) == "hot10" && top.getLong(1) > 0L)
  }
}
