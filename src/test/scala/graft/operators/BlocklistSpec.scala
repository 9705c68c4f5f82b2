package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val phrases = Seq("bad", "very bad", "not so bad", "clean")

  private def run(texts: (Long, String)*) =
    Blocklist.screen(texts.toDF("doc_id", "text"), "doc_id", "text",
      phrases).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), r.getBoolean(4)))).toMap

  test("token-boundary counts with overlaps; never matches inside words") {
    val got = run(
      1L -> "x very bad y bad z",      // "bad"×2, "very bad"×1
      2L -> "not so bad",              // "bad"×1 + "not so bad"×1
      3L -> "badly superbad notsobad", // substrings must NOT match
      4L -> "ok fine")
    assert(got(1L) == ((3L, 2L, "bad", true)))
    assert(got(2L) == ((2L, 2L, "bad", true)))   // tie 1-1 → list order
    assert(got(3L) == ((0L, 0L, null, false)))
    assert(got(4L) == ((0L, 0L, null, false)))
  }

  test("top_phrase takes the most frequent, first-listed on ties") {
    val got = run(1L -> "very bad very bad clean")
    // "bad"×2, "very bad"×2, "clean"×1 → tie at 2 → "bad" (listed first)
    assert(got(1L)._3 == "bad")
    val got2 = run(2L -> "clean clean very bad")
    // "clean"×2 beats "bad"×1/"very bad"×1
    assert(got2(2L) == ((4L, 3L, "clean", true)))
  }

  test("automaton counts equal a brute-force scan on random-ish text") {
    val vocab = Array("bad", "very", "not", "so", "clean", "x", "y")
    val texts = (0 until 50).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(30)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }
    val got = run(texts: _*)
    texts.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val brute = phrases.map { p =>
        val ws = p.split(" ", -1)
        (0 to toks.length - ws.length)
          .count(i => ws.indices.forall(j => toks(i + j) == ws(j)))
          .toLong
      }
      assert(got(id)._1 == brute.sum, s"doc $id n_hits")
      assert(got(id)._2 == brute.count(_ > 0).toLong, s"doc $id n_phrases")
    }
  }

  test("empty text and single-token docs are handled") {
    val got = run(1L -> "", 2L -> "bad", 3L -> "very")
    assert(got(1L) == ((0L, 0L, null, false)))
    assert(got(2L) == ((1L, 1L, "bad", true)))
    assert(got(3L) == ((0L, 0L, null, false)))
  }
}
