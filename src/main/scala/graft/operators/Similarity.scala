package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate/exact nearest-neighbor search over embedding columns.
  *
  * `bruteForceTopK` is the exact baseline: all-pairs cosine + windowed
  * rank. Norms are precomputed per side so the join computes one dot
  * product per pair. The query side should be the small side (broadcast).
  *
  * `ivfTopK` is the scale path: partition the corpus into Voronoi cells
  * around centroids (inverted file / IVF), search only the `nProbe`
  * closest cells per query. Candidate volume drops from |corpus| to
  * ~nProbe·|corpus|/k cells, and the expensive join is cell-cocated.
  */
object Similarity {

  /** Exact top-k neighbors for every vector in `queries` against `corpus`.
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k. Cosine is
    * rounded to 4 decimals *before* ranking so results are reproducible
    * across engines and summation orders; ties break by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vc"))
      .withColumn("nc", norm(col("vc")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("vq"))
      .withColumn("nq", norm(col("vq")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", graft.expressions.VectorExpressions.round4(cosinePrenormed(col("vq"), col("vc"), col("nq"), col("nc"))))
      // project the vectors away BEFORE the rank shuffle: the window sort
      // then moves 3 scalars per pair instead of two 64-float arrays
      .select("query_id", "neighbor_id", "cos")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact top-k with a BROADCAST corpus: collect the corpus matrix once
    * (it must fit on the driver/executors — the "small corpus, huge query
    * stream" regime; block the corpus externally when it doesn't), then
    * scan queries with mapPartitions keeping a bounded top-k heap per
    * query — no join, no window, no shuffle at all. Produces bit-identical
    * results to [[bruteForceTopK]] (same double math, same HALF_UP
    * rounding, same neighbor-id tie-break). */
  def bruteForceTopKBroadcast(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      maxCorpusRows: Long = 1000000L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // guardrail on the driver collect: misuse at corpus scale must be an
    // actionable error, not a driver OOM. The count is one column-pruned
    // scan — noise next to the all-pairs work this operator does anyway.
    val corpusRows = corpus.select(col(idCol)).count()
    require(corpusRows <= maxCorpusRows,
      s"bruteForceTopKBroadcast collects the corpus to the driver and " +
        s"got $corpusRows rows (cap $maxCorpusRows). For large corpora " +
        "use Similarity.ivfTopK (IVF ANN, distributed), or raise " +
        "maxCorpusRows deliberately if the driver can hold the matrix.")
    val mat: Array[(Long, Array[Float], Double)] = corpus
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .collect()
      .map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
        (id, v, math.sqrt(s))
      }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(mat)
    queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val corpus = bc.value
        rows.flatMap { case (qid, qv) =>
          var qs = 0.0; var i = 0
          while (i < qv.length) { qs += qv(i).toDouble * qv(i); i += 1 }
          val qn = math.sqrt(qs)
          // bounded top-k: ordering matches (cos DESC, neighbor_id ASC)
          // head = WORST kept: max of (-cos, id) = smallest cos, then
          // largest id — exactly what a better candidate evicts first
          val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by[(Double, Long), (Double, Long)] {
              case (cos, id) => (-cos, id)
            })
          corpus.foreach { case (cid, cv, cn) =>
            if (cid != qid) {
              var d = 0.0; var j = 0
              val n = math.min(qv.length, cv.length)
              while (j < n) { d += qv(j).toDouble * cv(j); j += 1 }
              // allocation-free round-4 (PortableMath.round4HalfUp is
              // bit-identical to the BigDecimal HALF_UP definition): the
              // per-pair BigDecimal+String dominated this N×N loop
              val cos = graft.functions.PortableMath.round4HalfUp(d / (qn * cn))
              if (heap.size < k) heap.enqueue((cos, cid))
              else {
                val (wc, wi) = heap.head
                if (cos > wc || (cos == wc && cid < wi)) {
                  heap.dequeue(); heap.enqueue((cos, cid))
                }
              }
            }
          }
          val worstFirst: Seq[(Double, Long)] = heap.dequeueAll
          worstFirst.reverse.zipWithIndex.map { case ((cos, cid), r) =>
            (qid, cid, cos, (r + 1).toLong)
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF approximate top-k: centroids from `centroidsOf` (or any externally
    * trained set), probe the nProbe nearest cells. Deterministic given the
    * centroid set. Returns the same shape as [[bruteForceTopK]].
    *
    * Shuffle budget (the 100 TB shape): the centroid table is index
    * metadata (nlist rows) and is broadcast; cell assignment is therefore
    * a map-side broadcast join + one hash aggregation per side — no
    * windows, no sorts. The only big shuffle is the candidate join on
    * `cell`, whose volume is ~|corpus|·nProbe/nlist per query instead of
    * |corpus|. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cent = broadcast(
      centroids.select(col("cell"), col("cvec"), norm(col("cvec")).as("cn")))
    // nearest cell per corpus vector: max_by over (csim, cell) — total
    // order, so ties are deterministic (higher cell wins); one hash agg.
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vc"))
      .withColumn("nc", norm(col("vc")))
      .join(cent)
      .withColumn("csim", cosinePrenormed(col("vc"), col("cvec"), col("nc"), col("cn")))
      .groupBy("neighbor_id")
      .agg(max_by(col("cell"), struct(col("csim"), col("cell"))).as("cell"),
        first(col("vc")).as("vc"), first(col("nc")).as("nc"))
    // nProbe nearest cells per query: collect (csim, cell) pairs, keep the
    // top slice, explode — one hash agg, no window.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("vq"))
      .withColumn("nq", norm(col("vq")))
      .join(cent)
      .withColumn("csim", cosinePrenormed(col("vq"), col("cvec"), col("nq"), col("cn")))
      .groupBy("query_id")
      .agg(slice(reverse(array_sort(collect_list(struct(col("csim"), col("cell"))))),
          1, nProbe).as("probes"),
        first(col("vq")).as("vq"), first(col("nq")).as("nq"))
      .select(col("query_id"), col("vq"), col("nq"),
        explode(col("probes.cell")).as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", graft.expressions.VectorExpressions.round4(cosinePrenormed(col("vq"), col("vc"), col("nq"), col("nc"))))
      // vectors dropped before the rank shuffle (see bruteForceTopK)
      .select("query_id", "neighbor_id", "cos")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Scan-fraction accounting for [[ivfTopK]]: replays the SAME cell
    * assignment (corpus max_by) and probe selection (query top-nProbe)
    * and reports the candidate-join volume the probe actually moves —
    * one row `(n_corpus, n_queries, scanned_pairs, scan_micro)` with
    * `scan_micro = scanned_pairs·10⁶ DIV (n_corpus·n_queries)`, the
    * measured scan fraction a bounded-scan deployment budgets against
    * (brute force ≡ 10⁶). Matches ivfTopK's candidate volume EXACTLY:
    * empty probed cells count 0 (left join, not inner — an inner join
    * would silently drop that query from n_queries too, so n_queries
    * is counted on the probes side before any join), and the self-pair
    * a corpus-member query contributes to its own probed cell is
    * subtracted (ivfTopK excludes `query_id =!= neighbor_id`). Empty
    * inputs yield a 0 row, not nulls. Broadcast-join hash aggs,
    * cell-sized everything after — index-metadata work, no corpus²
    * anywhere; the self-pair leg is one id-equi join moving
    * n_queries·nProbe rows. */
  def ivfScanStats(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      nProbe: Int): DataFrame = {
    val cent = broadcast(
      centroids.select(col("cell"), col("cvec"), norm(col("cvec")).as("cn")))
    val assign = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("vc"))
      .withColumn("nc", norm(col("vc")))
      .join(cent)
      .withColumn("csim",
        cosinePrenormed(col("vc"), col("cvec"), col("nc"), col("cn")))
      .groupBy("cid")
      .agg(max_by(col("cell"), struct(col("csim"), col("cell"))).as("cell"))
    val cellSizes = assign.groupBy("cell").agg(count(lit(1)).as("sz"))
    val probes = queries.select(col(idCol).as("qid"), col(vecCol).as("vq"))
      .withColumn("nq", norm(col("vq")))
      .join(cent)
      .withColumn("csim",
        cosinePrenormed(col("vq"), col("cvec"), col("nq"), col("cn")))
      .groupBy("qid")
      .agg(slice(reverse(array_sort(collect_list(struct(col("csim"), col("cell"))))),
        1, nProbe).as("probes"))
      .select(col("qid"), explode(col("probes.cell")).as("cell"))
    val nQ = probes.agg(countDistinct(col("qid")).as("n_queries"))
    val selfPairs = probes.join(assign,
        probes("qid") === assign("cid") && probes("cell") === assign("cell"))
      .agg(count(lit(1)).as("self_pairs"))
    probes.join(broadcast(cellSizes), Seq("cell"), "left")
      .agg(coalesce(sum(col("sz")), lit(0L)).as("raw_pairs"))
      .crossJoin(broadcast(nQ))
      .crossJoin(broadcast(selfPairs))
      .crossJoin(broadcast(corpus.agg(count(lit(1)).as("n_corpus"))))
      .select(col("n_corpus"), col("n_queries"),
        (col("raw_pairs") - col("self_pairs")).as("scanned_pairs"),
        expr("CASE WHEN n_corpus * n_queries = 0 THEN 0L ELSE " +
          "(raw_pairs - self_pairs) * 1000000L DIV (n_corpus * n_queries) " +
          "END").as("scan_micro"))
  }

  /** FAISS-style refine step (the IndexRefineFlat pattern): re-score an
    * approximate candidate list with EXACT cosine over the true vectors
    * and keep the top-k per query. `candidates` is (query_id,
    * neighbor_id) — typically the top-C (C ≥ 3–5×k) of an ADC /
    * reconstruction scan, so the joins here move C rows per query,
    * never corpus². Both vector fetches are id-equi joins (shuffle on
    * id — co-locatable with the corpus layout at scale); ranking
    * follows the bruteForceTopK contract (round-4 cosine, id
    * tie-break), so a refined list over a candidate set containing the
    * true top-k IS the exact top-k. */
  def refineTopK(candidates: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vc"))
      .withColumn("nc", norm(col("vc")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("vq"))
      .withColumn("nq", norm(col("vq")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    candidates.select(col("query_id"), col("neighbor_id"))
      .join(q, "query_id").join(c, "neighbor_id")
      .withColumn("cos",
        graft.expressions.VectorExpressions.round4(cosinePrenormed(col("vq"), col("vc"), col("nq"), col("nc"))))
      // vectors dropped before the rank shuffle (see bruteForceTopK)
      .select("query_id", "neighbor_id", "cos")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic k-means++-style seeding (Arthur & Vassilvitskii,
    * SODA 2007, derandomized): pull a BOUNDED md5-rank sample of the
    * corpus to the driver — `max(64k, 2048)` rows by lowest
    * `md5("kpp|" + id)`, an engine-neutral uniform draw (the srpSigns
    * convention) that Spark plans as TakeOrdered (per-partition top-N +
    * driver merge, no shuffle) — then run farthest-point selection
    * locally over the sample: seed 0 is the lowest-rank vector; each
    * next seed maximizes `D² · (0.5 + 0.5·u)` where
    * `D = 1 − cos(v, nearest chosen seed)` and `u ∈ [0,1)` is the
    * md5-derived per-row uniform — k-means++'s D²-proportional sampling
    * with the randomness replaced by a reproducible hash weight (the
    * bounded factor keeps far points dominant while breaking
    * grid/ordering artifacts); ties break by lowest id. Seeding off a
    * uniform sample is the standard large-scale practice (MLlib's
    * k-means|| oversamples for the same reason); the driver holds
    * sample×dim floats and the selection is sample×k dot products —
    * microseconds, and NO distributed pass beyond the one TakeOrdered.
    * Far better dispersion than lowest-k-ids (which seeds k
    * near-identical vectors when low ids correlate). */
  private def kppSeeds(training: DataFrame, idCol: String, vecCol: String,
      k: Int): IndexedSeq[Array[Float]] = {
    val sampleN = math.max(64 * k, 2048)
    val rank = md5(concat(lit("kpp|"), col(idCol).cast("string")))
    // (id, vec, u) by ascending rank; u = first 8 rank nibbles / 2^32
    val sample: Array[(Long, Array[Float], Double)] = training
      .select(col(idCol).cast("long"), col(vecCol), rank.as("__r"))
      .orderBy(col("__r")).limit(sampleN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        java.lang.Long.parseLong(r.getString(2).take(8), 16) / 4294967296.0))
    require(sample.nonEmpty, "kppSeeds: empty training set")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
    }
    // best-so-far distance to the chosen set, updated per new seed
    val best = Array.fill(sample.length)(Double.MaxValue)
    var seeds = IndexedSeq(sample.head._2)
    var latest = sample.head._2
    while (seeds.size < k) {
      var pick = -1; var pickScore = -1.0; var pickId = Long.MaxValue
      var i = 0
      while (i < sample.length) {
        val (id, v, u) = sample(i)
        val d = math.min(best(i), 1.0 - cos(v, latest))
        best(i) = d
        val score = d * d * (0.5 + 0.5 * u)
        if (score > pickScore || (score == pickScore && id < pickId)) {
          pick = i; pickScore = score; pickId = id
        }
        i += 1
      }
      latest = sample(pick)._2
      seeds = seeds :+ latest
    }
    seeds
  }

  /** Lloyd's k-means over an embedding column, cosine geometry.
    *
    * MLlib-style driver-held centroids: each iteration broadcasts the k
    * centroid vectors (bounded index metadata, like any broadcast-join
    * side), assigns every row to its nearest centroid with one hash
    * aggregation, and reduces new means with [[graft.expressions.FloatVecSumAgg]] —
    * so per iteration exactly k×dim partial sums cross the shuffle, no
    * matter the corpus size. Deterministic: init = [[kppSeeds]]
    * (derandomized k-means++ — md5-rank-weighted farthest-point); ties
    * in assignment break by cell id. Empty cells keep their previous
    * centroid. Train on a `df.sample` at very large scale.
    */
  def trainKMeans(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the training projection is scanned once per iteration — cache it
    // (MLlib KMeans does the same); unpersisted before returning
    val training = df.select(col(idCol), col(vecCol)).cache()
    // cells are 0..k-1, positional: cents(i) is cell i's vector
    var cents: IndexedSeq[Array[Float]] = kppSeeds(training, idCol, vecCol, k)
    for (_ <- 0 until iters) {
      // unit-normalized centroids: assignment is a per-row argmax of
      // dot(v, ĉ_i) — entirely map-side, no join, no row blowup, ONE
      // native PqCodes call per row (the per-centroid transform-HOF
      // chain was interpreted per entry — the SrpBandKeys lesson); the
      // only shuffle is k×dim partial sums from FloatVecSumAgg.
      val unit: Seq[Seq[Float]] = cents.map { v0 =>
        val n = math.max(math.sqrt(v0.map(x => x.toDouble * x).sum), 1e-12)
        v0.map(x => (x / n).toFloat).toSeq
      }.toSeq
      val sums = training.select(col(vecCol).as("v"))
        .withColumn("cell",
          graft.expressions.VectorExpressions.argmaxCell(col("v"), unit))
        .groupBy("cell")
        .agg(graft.expressions.VectorExpressions.floatVecSum(col("v")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val updated = sums.map { r =>
        r.getInt(0) -> r.getSeq[Double](1).map(x => (x / r.getLong(2)).toFloat).toArray
      }.toMap
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }
    training.unpersist(blocking = false)
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cell", "cvec")
  }

  /** Mean-vector centroids per label column — a deterministic, cheap way
    * to seed IVF cells when an external k-means isn't available. Emits
    * `cvec: array<float>` to match the corpus embedding type (FloatVecDot
    * is strict about float inputs). */
  def centroidsOf(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"),
        transform(col("pm"), p => p.getField("m").cast("float")).as("cvec"))
}
