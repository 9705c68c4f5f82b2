package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Corpus deduplication operators for training-data pipelines.
  *
  * All operators are shuffle-aware by construction:
  *   - exact dedup = one hash aggregation (map-side partial combine);
  *   - n-gram Jaccard = inverted-index (shingle) join with stop-shingle
  *     removal, never an all-pairs cross join;
  *   - MinHash-LSH = per-row signatures (no shuffle) + band-bucket join
  *     that only materializes candidate pairs;
  *   - SimHash = per-row signature + hash aggregation;
  *   - embedding near-dup = all-pairs only over LSH/blocking candidates
  *     (the brute-force form here is the small-side/verification path).
  */
object Dedup {

  /** Exact duplicate groups by content hash. One shuffle on md5(text);
    * at 100 TB this is the cheapest possible formulation (the hash is
    * 128-bit, so collisions are ignorable; group-by gets map-side combine).
    * Returns one row per distinct content: canonical keep id, dup count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Near-duplicate pairs by word n-gram Jaccard similarity, via an
    * inverted index on shingles:
    *
    *   docs → distinct shingles → (shingle, doc) postings
    *        → drop shingles with document frequency > maxDf  ("stop
    *          shingles" — they contribute O(df²) candidate rows and almost
    *          no discriminative signal; standard at web scale)
    *        → self-join postings on shingle → per-pair common count
    *        → jaccard = common / (|A| + |B| − common)  on the *filtered*
    *          shingle sets (consistent numerator/denominator).
    *
    * Never materializes non-overlapping pairs. The only shuffles are the
    * postings join key (shingle) and the pair aggregation. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.2, maxDf: Long = 100L): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"),
        explode(graft.expressions.TextExpressions
          .wordShingles(col(textCol), n)).as("sh"))
    val kept = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df_count"))
        .filter(col("df_count") <= maxDf)
        .select("sh"),
      "sh")
    val sizes = kept.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val pairs = kept.select(col("doc").as("doc_a"), col("sh"))
      .join(kept.select(col("doc").as("doc_b"), col("sh")), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnsRenamed(Map("doc" -> "doc_a", "n_sh" -> "na")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc" -> "doc_b", "n_sh" -> "nb")), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Near-duplicate pairs by shingle CONTAINMENT — |A∩B| / min(|A|,|B|).
    * Jaccard misses subset relationships (a doc quoting another wholesale
    * scores low when their sizes differ); containment flags them. Same
    * inverted-index shape as [[jaccardPairs]]: only co-occurring pairs
    * materialize, shuffles on shingle then pair. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.6, maxDf: Long = 100L): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"),
        explode(graft.expressions.TextExpressions
          .wordShingles(col(textCol), n)).as("sh"))
    val kept = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df_count"))
        .filter(col("df_count") <= maxDf)
        .select("sh"),
      "sh")
    val sizes = kept.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    kept.select(col("doc").as("doc_a"), col("sh"))
      .join(kept.select(col("doc").as("doc_b"), col("sh")), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      .join(sizes.withColumnsRenamed(Map("doc" -> "doc_a", "n_sh" -> "na")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc" -> "doc_b", "n_sh" -> "nb")), "doc_b")
      .withColumn("containment",
        col("common").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select("doc_a", "doc_b", "containment")
  }

  /** MinHash-LSH candidate pairs with exact-Jaccard verification.
    *
    * Signatures (numHashes md5-min values) are computed per row with
    * higher-order functions — zero shuffle. Banding (numBands bands of
    * numHashes/numBands rows) buckets docs by band key; only docs sharing
    * a bucket become candidates, which is the scale path: candidate volume
    * tracks true-duplicate volume, not corpus². Candidates then get exact
    * Jaccard on their full shingle sets (array intersect/union per pair —
    * fine because candidates are few). */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, numHashes: Int = 8, numBands: Int = 4): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must divide into bands")
    val rows = numHashes / numBands
    val withSh = df.select(col(idCol).as("doc"),
      graft.expressions.TextExpressions.wordShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    // all numHashes signature values in ONE pass over the shingle array
    // (native expression; the per-seed HOF fold re-walked the array
    // numHashes times, interpreted)
    val sigs = withSh.withColumn("sigs",
      graft.expressions.TextExpressions.minhashSignatures(col("sh"), numHashes))
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        concat((0 until rows).map(r =>
          element_at(col("sigs"), b * rows + r + 1)): _*).as("key"))
    }
    val bands = sigs.select(col("doc"), col("sh"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("sh"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.select(col("doc").as("doc_a"), col("sh").as("sh_a"), col("band"), col("key"))
      .join(bands.select(col("doc").as("doc_b"), col("sh").as("sh_b"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .dropDuplicates("doc_a", "doc_b")
    cand.withColumn("jaccard",
      size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash duplicate groups: docs sharing a 32-bit simhash signature.
    * Per-row signature + one hash aggregation; Hamming-radius>0 search
    * would add rotated-band buckets (same join pattern as MinHash-LSH). */
  def simhashGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
      graft.expressions.TextExpressions
        .simhash32Native(tokens(col(textCol))).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc")).as("keep_id"))

  /** SimHash near-duplicate PAIRS within a Hamming radius, via pigeonhole
    * banding: split the 32-bit signature into `bands` contiguous bands —
    * any two signatures within Hamming distance < `bands` must agree on
    * at least one whole band — bucket-join on (band, value), then verify
    * the exact distance with `bit_count(xor)` (codegen'd integer ops).
    * Requires `radius < bands` for the pigeonhole guarantee, so the
    * result equals the all-pairs scan exactly, at candidate-join cost. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      radius: Int = 3, bands: Int = 4): DataFrame = {
    require(radius < bands, "pigeonhole needs radius < bands")
    require(32 % bands == 0, "bands must divide 32")
    val bandLen = 32 / bands
    val sigs = df.select(col(idCol).as("doc"),
      graft.expressions.TextExpressions
        .simhash32Native(tokens(col(textCol))).as("sig"))
      .withColumn("sigv", conv(col("sig"), 2, 10).cast("long"))
    val banded = sigs.select(col("doc"), col("sigv"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          substring(col("sig"), b * bandLen + 1, bandLen).as("key"))): _*))
        .as("bk"))
      .select(col("doc"), col("sigv"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.select(col("doc").as("doc_a"), col("sigv").as("va"), col("band"), col("key"))
      .join(banded.select(col("doc").as("doc_b"), col("sigv").as("vb"),
        col("band"), col("key")), Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(expr("va ^ vb")).cast("long").as("hamming"))
      // verify BEFORE dedup: the distance check is cheap codegen'd int
      // math, and it shrinks the dropDuplicates shuffle to winners only
      .filter(col("hamming") <= radius)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Connected components over an undirected pair list (near-dup pairs →
    * duplicate CLUSTERS, so one canonical document survives per cluster
    * even when A~B and B~C but A!~C). Hash-to-min label propagation:
    * every vertex repeatedly adopts the minimum label among itself and
    * its neighbors until a fixpoint — rounds = cluster diameter, and
    * near-dup clusters are shallow. Each round is one shuffle join + one
    * aggregation over the EDGE list only (vertices outside any pair never
    * enter the loop); each round's result is localCheckpointed, which
    * truncates lineage (superseded rounds' blocks are freed by the
    * ContextCleaner once unreferenced). Throws rather than silently
    * returning partial labels if `maxRounds` is hit before the fixpoint.
    * For high-diameter graphs at web scale, swap the round body for
    * large-star/small-star (Kiveris et al., "Connected Components in
    * MapReduce", SoCC 2014) — same join/agg primitives, O(log²) rounds.
    *
    * Returns (vertex, component) with component = min vertex id reachable.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 25): DataFrame = {
    // Iterative algorithms MUST truncate lineage per round: a persist()
    // chain keeps the full logical plan growing linearly, and Catalyst
    // re-analyzes the whole tree every round (quadratic driver time —
    // observed as a multi-minute stall on a 29-round path graph).
    // localCheckpoint (eager) replaces the plan with its materialized RDD;
    // on a real cluster with an HDFS checkpoint dir, sc.setCheckpointDir +
    // .checkpoint() is the fault-tolerant equivalent.
    val edges = pairs.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .union(pairs.select(col(dstCol).as("s"), col(srcCol).as("d")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("s").as("v")).distinct()
      .withColumn("comp", col("v"))
      .localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val viaNbr = edges.join(labels, edges("d") === labels("v"))
        .groupBy(col("s").as("nv")).agg(min(col("comp")).as("ncomp"))
      val cand = labels.join(viaNbr, labels("v") === col("nv"), "left")
        .select(col("v"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp2"))
        .localCheckpoint() // eager: one job, O(1) plan next round
      changed = cand.filter(col("comp2") < col("comp")).count()
      labels = cand.select(col("v"), col("comp2").as("comp"))
      round += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          s"($changed labels still changing) — raise maxRounds " +
          "(rounds needed = cluster diameter)")
    labels
  }

  /** Embedding near-duplicate pairs above a cosine threshold (brute-force
    * all-pairs — the verification/small-side path; at corpus scale feed it
    * LSH-bucketed candidates from [[Similarity]] instead). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val withNorm = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = withNorm.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosinePrenormed(col("va"), col("vb"), col("na"), col("nb")), 4))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
