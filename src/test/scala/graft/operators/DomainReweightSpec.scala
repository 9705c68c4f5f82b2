package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DomainReweight.doremiMix: EG-step invariants on a corpus with one
  * deliberately hard (high-NLL) domain. */
class DomainReweightSpec extends SparkSpec {

  // "fluent": highly repetitive bigrams (the LM learns them → low NLL);
  // "hard": every doc pairwise-distinct token soup (high NLL);
  // "tiny": same fluent text, few docs (tests the ε/S floor, not NLL)
  private def corpus = {
    import spark.implicits._
    val fluent = (0 until 8).map(i =>
      (i.toLong, "the cat sat on the mat and the cat sat", "fluent"))
    val hard = (100 until 108).map(i =>
      (i.toLong, s"zq$i xv$i kj$i wp$i ml$i rt$i ub$i", "hard"))
    val tiny = (200 until 202).map(i =>
      (i.toLong, "the cat sat on the mat and the cat sat", "tiny"))
    (fluent ++ hard ++ tiny).toDF("doc_id", "text", "src")
  }

  test("hard domain gets excess > 0 and strictly more weight than fluent") {
    val out = DomainReweight.doremiMix(corpus, "doc_id", "text", "src")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(5), r.getDouble(6))).toMap
    val (exH, wH, _) = out("hard")
    val (exF, wF, _) = out("fluent")
    assert(exH > 0.0, s"hard excess $exH")
    assert(exF == 0.0, s"fluent excess $exF (below-reference domains clamp)")
    assert(wH > wF, s"weight hard=$wH fluent=$wF")
  }

  test("below-reference domains boost exactly 1.0; weights and mix sum to 1") {
    val rows = DomainReweight.doremiMix(corpus, "doc_id", "text", "src")
      .collect()
    rows.filter(_.getDouble(3) == 0.0)
      .foreach(r => assert(r.getDouble(4) == 1.0,
        s"${r.getString(0)} boost ${r.getDouble(4)}"))
    val s = rows.length
    val wSum = rows.map(_.getDouble(5)).sum
    val mSum = rows.map(_.getDouble(6)).sum
    assert(math.abs(wSum - 1.0) <= s * 1e-6 + 1e-9, s"weight sum $wSum")
    assert(math.abs(mSum - 1.0) <= s * 1e-6 + 1e-9, s"mix sum $mSum")
  }

  test("uniform smoothing floors every domain at eps/S") {
    val rows = DomainReweight.doremiMix(corpus, "doc_id", "text", "src",
      smoothNum = 1L, smoothDen = 5L).collect()
    val floor = 1.0 / 5 / rows.length - 1e-6
    rows.foreach(r => assert(r.getDouble(6) >= floor,
      s"${r.getString(0)} mix ${r.getDouble(6)} < floor $floor"))
    // ε=1 (all smoothing) → exactly uniform regardless of NLL
    DomainReweight.doremiMix(corpus, "doc_id", "text", "src",
      smoothNum = 1L, smoothDen = 1L).collect()
      .foreach(r => assert(math.abs(r.getDouble(6) - 1.0 / 3) < 1e-6,
        s"${r.getString(0)} mix ${r.getDouble(6)} not uniform"))
  }

  test("deterministic across runs; eta scales differentiation monotonically") {
    def mixes(eta: Double) =
      DomainReweight.doremiMix(corpus, "doc_id", "text", "src", eta = eta)
        .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(mixes(1.0) == mixes(1.0))
    // larger eta → the hard domain takes strictly more of the EG weight
    assert(mixes(3.0)("hard") > mixes(1.0)("hard"))
  }
}
