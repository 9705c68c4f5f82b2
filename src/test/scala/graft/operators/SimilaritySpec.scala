package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Similarity-search invariants that the DuckDB oracle can't express:
  * the native FloatVecDot must agree with its HOF reference, and IVF
  * recall@k against the exact brute force must be high on the clustered
  * synthetic embeddings. */
class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("FloatVecDot agrees with the HOF reference implementation") {
    val diff = emb.limit(200).select(
      abs(VectorFunctions.dot(col("embedding"), col("embedding")) -
        VectorFunctions.dotHof(col("embedding"), col("embedding"))).as("d"))
      .agg(max(col("d"))).collect().head.getDouble(0)
    assert(diff < 1e-9, s"native vs HOF dot diverged by $diff")
  }

  test("FloatVecDot rejects non-float arrays at analysis time") {
    val bad = emb.select(transform(col("embedding"), x => x.cast("double")).as("v"))
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorFunctions.dot(col("v"), col("v"))).collect()
    }
  }

  // The synthetic embeddings are near-uniform in cosine space (numpy
  // spherical k-means tops out at ~0.59 recall@5 with nProbe=3 of 10) —
  // so the thresholds assert "as good as the data allows", and the
  // all-cells probe asserts exactness of the mechanism itself.
  test("IVF top-k recall vs brute force >= 0.5 at nProbe=3/10") {
    val k = 5
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val cents = Similarity.trainKMeans(emb, "vec_id", "embedding", k = 10, iters = 5)
    val approx = Similarity.ivfTopK(emb, emb, cents, "vec_id", "embedding", k,
      nProbe = 3)
      .select(col("query_id"), col("neighbor_id"))
    val nExact = exact.count()
    val nHit = exact.intersect(approx).count()
    val recall = nHit.toDouble / nExact
    assert(recall >= 0.5, s"recall@$k = $recall")
  }

  test("refineTopK over a candidate set containing the true top-k IS exact") {
    val k = 3
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k)
    // candidates = exact top-10: a superset of the true top-3, so the
    // refine contract says the refined list equals the exact top-3
    val cands = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val refined = Similarity.refineTopK(cands, emb, emb, "vec_id", "embedding", k)
    assert(exact.exceptAll(refined).isEmpty && refined.exceptAll(exact).isEmpty)
    assert(refined.count() == exact.count())
  }

  test("refineTopK lifts IVF-PQ-style recall over its own candidate scan") {
    val k = 5
    val cents = Similarity.trainKMeans(emb, "vec_id", "embedding", k = 10, iters = 5)
    // degrade the scoring side by coarse rounding (a stand-in for PQ
    // reconstruction error), search with it, then refine with the TRUE
    // vectors — refined recall must not be lower
    val degraded = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double"), 1).cast("float")).as("embedding"))
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val raw = Similarity.ivfTopK(degraded, emb, cents, "vec_id", "embedding",
      k, nProbe = 3).select(col("query_id"), col("neighbor_id"))
    val cands = Similarity.ivfTopK(degraded, emb, cents, "vec_id", "embedding",
      k = 25, nProbe = 3).select(col("query_id"), col("neighbor_id"))
    val refined = Similarity.refineTopK(cands, emb, emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val n = exact.count()
    val rawRecall = exact.intersect(raw).count().toDouble / n
    val refRecall = exact.intersect(refined).count().toDouble / n
    assert(refRecall >= rawRecall,
      s"refine must not lose recall: raw=$rawRecall refined=$refRecall")
  }

  test("k-means++ seeding spreads cells: no cell swallows the corpus") {
    // lowest-k-ids seeding on clustered data can seed k near-identical
    // vectors and leave one giant cell; the kpp init must not. Assert a
    // balance bound that lowest-id seeding fails on pathological
    // orderings: largest cell < 60% of rows, and >= half the cells
    // non-trivially populated.
    val k = 8
    val cents = Similarity.trainKMeans(emb, "vec_id", "embedding", k, iters = 5)
    val assigned = SemDedup.assignCells(
      emb.select(col("vec_id"), col("embedding")), "embedding", cents)
    val counts = assigned.groupBy(col("cell")).count()
      .collect().map(_.getLong(1))
    val total = counts.sum
    assert(counts.max.toDouble / total < 0.6,
      s"a single cell holds ${counts.max}/$total rows")
    assert(counts.count(_ >= total / (4L * k)) >= k / 2,
      s"cell sizes too degenerate: ${counts.toSeq.sorted.reverse}")
  }

  test("broadcast-corpus top-k is identical to the join+window form") {
    val a = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
    val b = Similarity.bruteForceTopKBroadcast(emb, emb, "vec_id", "embedding", 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == b.count())
  }

  test("broadcast-corpus top-k refuses a corpus above the driver cap") {
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopKBroadcast(emb, emb, "vec_id", "embedding",
        k = 5, maxCorpusRows = 10L)
    }
    assert(e.getMessage.contains("ivfTopK"),
      s"error must point at the scale path: ${e.getMessage}")
  }

  test("IVF probing every cell equals exact brute force") {
    val k = 3
    val cents = Similarity.trainKMeans(emb, "vec_id", "embedding", k = 4, iters = 2)
    val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k)
    val full = Similarity.ivfTopK(emb, emb, cents, "vec_id", "embedding", k,
      nProbe = 4)
    assert(exact.exceptAll(full).isEmpty && full.exceptAll(exact).isEmpty)
  }

  test("native expressions are callable from SQL after registration") {
    graft.expressions.GraftFunctions.register(spark)
    emb.limit(50).createOrReplaceTempView("emb_sql")
    val d = spark.sql(
      "SELECT float_vec_dot(embedding, embedding) AS d FROM emb_sql")
      .collect().head.getDouble(0)
    assert(d > 0.0)
    val s = spark.sql("SELECT float_vec_sum(embedding) AS s FROM emb_sql")
      .collect().head.getSeq[Double](0)
    assert(s.length == 64 && s.exists(_ != 0.0))
    val t = spark.sql("""SELECT
        word_shingles('a b c d', 2) AS sh,
        simhash32(split('a b c', ' ')) AS sim,
        profile_scores('the cat the', array('the','a'), array('el')) AS ps""")
      .collect().head
    assert(t.getSeq[String](0) == Seq("a_b", "b_c", "c_d"))
    assert(t.getString(1).length == 32)
    assert(t.getSeq[Long](2) == Seq(2L, 0L))
    val u = spark.sql("""SELECT
        bpeish_token_count('abc 12 X!') AS bp,
        minhash_signatures(word_shingles('a b c d', 2), 3) AS mh,
        winnow_fingerprints('a b c d e f g h', 3, 4) AS wf,
        byte_block_simhash64(cast('abcdefgh' AS binary), 4) AS bb,
        repetition_signals('a b a b a') AS rs""")
      .collect().head
    assert(u.getLong(0) == 4L) // abc, 12, X, !
    assert(u.getSeq[String](1).length == 3 &&
      u.getSeq[String](1).forall(_.length == 32))
    assert(u.getSeq[String](2).nonEmpty)
    assert(u.get(3) != null)
    assert(u.getSeq[Double](4).length == 3)
  }

  test("ivfScanStats matches ivfTopK's candidate volume exactly") {
    import spark.implicits._
    val corpus = Seq((1L, Array(1.0f, 0.1f)), (2L, Array(0.9f, 0.2f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f)), (99L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f)))
      .toDF("cell", "cvec")
    val stats = Similarity.ivfScanStats(corpus, queries, cents,
      "vec_id", "embedding", nProbe = 1).collect().head
    // query 99 probes the EMPTY cell 1: still counted (n_queries = 2),
    // contributes 0 pairs; query 1 is a corpus member of its own probed
    // cell 0, so the self-pair ivfTopK never scores is subtracted
    // (cell 0 holds 2 corpus rows, minus 1 self = 1 scanned pair)
    assert(stats.getAs[Long]("n_queries") == 2L)
    assert(stats.getAs[Long]("scanned_pairs") == 1L)
    assert(stats.getAs[Long]("n_corpus") == 2L)
    assert(stats.getAs[Long]("scan_micro") == 250000L)
    // and that IS the volume ivfTopK moves: exactly one candidate pair
    val cand = Similarity.ivfTopK(corpus, queries, cents,
      "vec_id", "embedding", k = 5, nProbe = 1)
    assert(cand.count() == 1L)
    // empty corpus: a zeros row, not nulls
    val empty = Similarity.ivfScanStats(corpus.limit(0), queries, cents,
      "vec_id", "embedding", nProbe = 1).collect().head
    assert(!empty.isNullAt(empty.fieldIndex("scanned_pairs")) &&
      empty.getAs[Long]("scanned_pairs") == 0L &&
      empty.getAs[Long]("scan_micro") == 0L &&
      empty.getAs[Long]("n_queries") == 2L)
  }

  test("centroids are float vectors (FloatVecDot strictness)") {
    val cents = Similarity.centroidsOf(emb, "label", "embedding")
    val el = cents.schema("cvec").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(el == org.apache.spark.sql.types.FloatType)
  }

  test("round4 expression == Spark round(x, 4) bit-for-bit (incl. nulls)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    val xs: Seq[java.lang.Double] =
      (1 to 20000).map(_ => java.lang.Double.valueOf(
        (rnd.nextDouble() * 2 - 1) * math.pow(10, rnd.nextInt(4) - 2))) ++
        Seq(null, java.lang.Double.valueOf(0.00005),
          java.lang.Double.valueOf(-0.00005), java.lang.Double.valueOf(-0.0))
    val rows = xs.toDF("x")
      .select(col("x"), round(col("x"), 4).as("want"),
        graft.expressions.VectorExpressions.round4(col("x")).as("got"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2), s"null mismatch at ${r.get(0)}")
      else assert(
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"mismatch at x=${r.get(0)}: want ${r.getDouble(1)} got ${r.getDouble(2)}")
    }
  }
}
