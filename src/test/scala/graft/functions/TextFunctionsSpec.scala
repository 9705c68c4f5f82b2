package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Property-style tests for the text primitives against plain-Scala
  * reference implementations over seeded-random token lists (scalacheck's
  * scalatest bridge isn't on the classpath, so sampling is done with a
  * fixed-seed Random — same coverage, deterministic). */
class TextFunctionsSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def randomDoc(): List[String] = {
    val n = rnd.nextInt(31)
    List.fill(n)(List.fill(1 + rnd.nextInt(7))(
      ('a' + rnd.nextInt(26)).toChar).mkString)
  }
  private val docs: Seq[List[String]] =
    Seq.fill(40)(randomDoc()).filter(_.nonEmpty)

  /** Evaluate columns over all sample docs in ONE Spark job. */
  private def evalAll(c: org.apache.spark.sql.Column*) = {
    import spark.implicits._
    docs.map(_.mkString(" ")).toDF("text")
      .withColumn("toks", tokens(col("text")))
      .select(c: _*).collect()
  }

  test("shingles match a reference sliding-window implementation") {
    for (n <- 1 to 5) {
      val rows = evalAll(shingles(col("toks"), n))
      docs.zip(rows).foreach { case (doc, row) =>
        val want = doc.sliding(n).filter(_.size == n)
          .map(_.mkString("_")).toList.distinct
        assert(row.getSeq[String](0) == want, s"doc=$doc n=$n")
      }
    }
  }

  test("winnow fingerprints: w-window minima of k-gram md5s, distinct") {
    val (k, w) = (3, 4)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = evalAll(winnowFromHashes(kgramHashes(col("toks"), k), w))
    docs.zip(rows).foreach { case (doc, row) =>
      val hashes = doc.sliding(k).filter(_.size == k)
        .map(g => md5hex(g.mkString("_"))).toList
      val want =
        if (hashes.size >= w) hashes.sliding(w).map(_.min).toList.distinct
        else hashes.distinct
      assert(row.getSeq[String](0) == want, s"doc=$doc")
    }
  }

  test("repetition signals match direct computation") {
    // random docs rarely repeat bigrams — add genuinely repetitive ones
    // so both signals move off zero
    val docs = this.docs ++ Seq(
      List("a", "b", "a", "b", "a", "b", "c"),
      List("spam", "spam", "spam", "spam"),
      List("x"), List("x", "y"))
    // staged ngram columns, per the TextFunctions staging rule
    import spark.implicits._
    val rows = docs.map(_.mkString(" ")).toDF("text")
      .withColumn("toks", tokens(col("text")))
      .withColumn("bg", shinglesOrdered(col("toks"), 2))
      .select(dupNgramRatio(col("bg")), topNgramShare(col("bg"))).collect()
    docs.zip(rows).foreach { case (doc, row) =>
      val bg = doc.sliding(2).filter(_.size == 2).map(_.mkString("_")).toList
      val (wantDup, wantTop) =
        if (bg.isEmpty) (0.0, 0.0)
        else (1.0 - bg.distinct.size.toDouble / bg.size,
          bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size)
      assert(row.getDouble(0) == wantDup, s"dup doc=$doc")
      assert(row.getDouble(1) == wantTop, s"top doc=$doc")
    }
    // the native one-pass expression must match the HOF chain bit-for-bit
    val both = docs.map(_.mkString(" ")).toDF("text")
      .withColumn("toks", tokens(col("text")))
      .withColumn("bg", shinglesOrdered(col("toks"), 2))
      .withColumn("tg", shinglesOrdered(col("toks"), 3))
      .withColumn("sig",
        graft.expressions.TextExpressions.repetitionSignals(col("text")))
      .select(dupNgramRatio(col("bg")), dupNgramRatio(col("tg")),
        topNgramShare(col("bg")),
        element_at(col("sig"), 1), element_at(col("sig"), 2),
        element_at(col("sig"), 3)).collect()
    docs.zip(both).foreach { case (doc, r) =>
      assert(r.getDouble(0) == r.getDouble(3), s"dup2 native!=HOF doc=$doc")
      assert(r.getDouble(1) == r.getDouble(4), s"dup3 native!=HOF doc=$doc")
      assert(r.getDouble(2) == r.getDouble(5), s"top2 native!=HOF doc=$doc")
    }
  }

  test("quality metrics match direct computation") {
    val rows = evalAll(nTokens(col("toks")), nDistinctTokens(col("toks")),
      avgTokenLen(col("toks")))
    docs.zip(rows).foreach { case (doc, row) =>
      assert(row.getLong(0) == doc.size)
      assert(row.getLong(1) == doc.distinct.size)
      assert(math.abs(row.getDouble(2) -
        doc.map(_.length).sum.toDouble / doc.size) < 1e-9, s"doc=$doc")
    }
  }

  test("simhash is 32 bits and depends only on the distinct-token set") {
    val a = evalAll(simhash32(col("toks")))
    import spark.implicits._
    val doubled = docs.map(d => (d ++ d).mkString(" ")).toDF("text")
      .withColumn("toks", tokens(col("text")))
      .select(simhash32(col("toks"))).collect()
    docs.indices.foreach { i =>
      val sig = a(i).getString(0)
      assert(sig.length == 32 && sig.forall(c => c == '0' || c == '1'))
      assert(sig == doubled(i).getString(0))
    }
  }

  test("redactPii masks email/phone/ipv4 and leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "contact jane.doe+spam@sub.example.org today",
      "call +4915501234567 or visit 192.168.0.254 now",
      "version 1.2.3.4.5 is not an ip boundary test 999.1.1.1x",
      "plain text with no pii at all")
      .toDF("text").select(redactPii(col("text"))).collect().map(_.getString(0))
    assert(rows(0) == "contact <EMAIL> today")
    assert(rows(1) == "call <PHONE> or visit <IPV4> now")
    // boundary semantics: '.' is a non-word char, so 1.2.3.4 inside
    // 1.2.3.4.5 has valid \b on both ends and masks; 999.1.1.1x has a
    // word char right after the last digit, so nothing matches
    assert(rows(2) == "version <IPV4>.5 is not an ip boundary test 999.1.1.1x")
    assert(rows(3) == "plain text with no pii at all")
  }

  test("simhash64 matches an independent md5-bit reference") {
    val rows = evalAll(
      graft.expressions.TextExpressions.simhash64Native(col("toks")))
    docs.zip(rows).foreach { case (doc, r) =>
      val sums = new Array[Int](64)
      doc.distinct.foreach { t =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        (0 until 64).foreach { j =>
          if (((d(j >> 3) >> (7 - (j & 7))) & 1) == 1) sums(j) += 1
          else sums(j) -= 1
        }
      }
      val want = sums.map(s => if (s >= 0) '1' else '0').mkString
      assert(r.getString(0) == want, s"doc=$doc")
    }
  }

  test("native expressions equal their HOF twins on random docs") {
    import graft.expressions.TextExpressions._
    val rows = evalAll(
      shingles(col("toks"), 4),
      wordShingles(col("text"), 4),
      simhash32(col("toks")),
      simhash32Native(col("toks")),
      winnowFromHashes(kgramHashes(col("toks"), 3), 4),
      winnowFingerprintsNative(col("text"), 3, 4),
      minhashSig(shingles(col("toks"), 4), 0),
      minhashSig(shingles(col("toks"), 4), 3))
    docs.zip(rows).foreach { case (doc, r) =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"shingles: $doc")
      assert(r.getString(2) == r.getString(3), s"simhash: $doc")
      assert(r.getSeq[String](4) == r.getSeq[String](5), s"winnow: $doc")
    }
    // minhash: native array element i == HOF minhashSig(seed = i)
    val mh = evalAll(
      when(size(wordShingles(col("text"), 4)) > 0,
        minhashSignatures(wordShingles(col("text"), 4), 4)).as("sigs"),
      minhashSig(shingles(col("toks"), 4), 0),
      minhashSig(shingles(col("toks"), 4), 3))
    docs.zip(mh).foreach { case (doc, r) =>
      if (!r.isNullAt(0)) {
        assert(r.getSeq[String](0)(0) == r.getString(1), s"minhash s0: $doc")
        assert(r.getSeq[String](0)(3) == r.getString(2), s"minhash s3: $doc")
      } else assert(r.isNullAt(1), s"null mismatch: $doc")
    }
  }

  test("minhash signature is the true min over per-shingle hashes") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = evalAll(shingles(col("toks"), 2),
      minhashSig(shingles(col("toks"), 2), 7))
    docs.zip(rows).foreach { case (doc, row) =>
      val sh = row.getSeq[String](0)
      if (sh.nonEmpty)
        assert(row.getString(1) == sh.map(t => md5hex(s"7|$t")).min, s"doc=$doc")
    }
  }

  test("native bpeish token count equals the regex form on unicode fuzz") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    // alphabet spanning every branch: letter/digit runs, space, uppercase,
    // punctuation, tab/newline, 2- and 3-byte BMP chars, a supplementary
    // (4-byte, surrogate pair) code point
    val alpha: IndexedSeq[String] = IndexedSeq(
      "a", "b", "z", "0", "7", " ", "  ", "A", "Z", ".", ",", "!", "\t",
      "\n", "é", "ü", "€", "世", "😀")
    val fuzz = Seq.fill(300)(
      Seq.fill(r.nextInt(60))(alpha(r.nextInt(alpha.size))).mkString) ++
      Seq("", " ", "abc", "abc def", "a1b2", "AB CD", "héllo wörld",
        "😀😀", "a😀b")
    val rows = fuzz.toDF("text").select(
      bpeishTokenCount(col("text")),
      bpeishTokenCountRegex(col("text"))).collect()
    fuzz.zip(rows).foreach { case (doc, row) =>
      assert(row.getLong(0) == row.getLong(1),
        s"native=${row.getLong(0)} regex=${row.getLong(1)} doc=${doc.take(80)}")
    }
  }
}
