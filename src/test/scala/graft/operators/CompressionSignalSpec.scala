package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompressionSignalSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses harder than diverse text") {
    val rep = ("spam ham " * 40).trim
    val div = (0 until 80).map(i => s"w${i}q${i * 7 % 97}").mkString(" ")
    val out = CompressionSignal.compressionSignals(
      Seq((1L, rep), (2L, div)).toDF("doc_id", "text"), "text")
      .select("doc_id", "deflate_ratio", "repeat_gain_ok", "ratio_sane")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 < out(2L)._1,
      s"repetitive ratio ${out(1L)._1} !< diverse ${out(2L)._1}")
    assert(out.values.forall(v => v._2 && v._3), out.toString)
  }

  test("verdicts hold across the real documents table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = CompressionSignal.compressionSignals(docs, "text")
    assert(out.filter(!col("repeat_gain_ok") || !col("ratio_sane")).count() == 0)
    val bad = out.filter(col("deflate_len") <= 0 ||
      col("deflate_ratio") <= 0.0).count()
    assert(bad == 0)
  }

  test("deflate_length works on binary payloads and via SQL") {
    graft.expressions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT deflate_length(encode('aaaaaaaaaaaaaaaaaaaaaaaa', 'utf-8')) AS c")
      .as[Long].head()
    assert(n > 0 && n < 24, s"24 'a' bytes must deflate below identity: $n")
    // string and its utf-8 binary encoding compress identically
    val both = spark.sql(
      "SELECT deflate_length('graft spark graft spark graft') AS s, " +
      "deflate_length(encode('graft spark graft spark graft','utf-8')) AS b")
      .as[(Long, Long)].head()
    assert(both._1 == both._2)
  }

  test("null text yields null signal, not a crash") {
    val df = Seq((1L, "x y z a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = CompressionSignal.compressionSignals(df, "text")
      .select("doc_id", "deflate_len").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }
}
