package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity self-join over a string key —
  * the entity-resolution / fuzzy-matching primitive (approximate string
  * joins: Gravano et al., VLDB 2001): every pair of distinct keys with
  * ed(a, b) <= maxDist, exactly.
  *
  * TWO blocking schemes, both candidate→verify (a shared variant/segment
  * only bounds the distance from below, so every candidate is verified
  * with the true codegen'd `levenshtein` before anything is emitted):
  *
  *  - DELETION NEIGHBORHOOD (FastSS — Bocek et al., U. Zurich TR
  *    ifi-2007.02; Mor & Fraenkel, CACM 1982): index every string under
  *    each variant obtainable by deleting up to `maxDist` characters.
  *    If ed(a, b) <= d, an optimal alignment's common subsequence is
  *    reachable from a by deleting its substituted/deleted positions
  *    (<= d) and from b by deleting its substituted/inserted positions
  *    (<= d) — so a and b share a variant: recall-complete. O(len^d)
  *    variants per key — right for SHORT keys (titles, names).
  *
  *  - PASSJOIN SEGMENTS (Li, Deng & Feng, ICDE 2011): partition each
  *    string into d+1 segments; if ed(a, b) <= d then b contains at
  *    least one of a's segments VERBATIM (pigeonhole — d edits cannot
  *    touch all d+1 segments), at a start position bounded by the
  *    multi-match-aware window [p±(i−1)] ∩ [p+Δ±(d−i+1)]. Index
  *    postings are d+1 per key and probe substrings O(d²·(2d+1)) per
  *    key — LINEAR in key length, the scale path deletion
  *    neighborhoods (O(len²) variants at d=2) cannot offer for long
  *    keys (documents, URLs, addresses).
  *
  * [[selfJoin]] is the neighborhood join (unchanged short-key plan);
  * [[selfJoinHybrid]] is the production entry: neighborhood for keys up
  * to `maxKeyLen`, segments for longer ones, with the two length blocks
  * overlapping by `maxDist` so pairs straddling the boundary are caught
  * by the segment side (a pair's lengths differ by <= maxDist, so if
  * its longer key is in the segment block both keys are). Duplicated
  * overlap candidates collapse in the shared distinct.
  *
  * Scale shape: the only shuffles are the posting-keyed self-joins and
  * the candidate distinct; the length filter |len(a) − len(b)| <= d
  * prunes before verification; candidate volume tracks true-match
  * volume (high-df postings are remnants of near-identical keys,
  * exactly the collisions the join wants). */
object EditDistJoin {

  /** All (key_a < key_b) pairs of DISTINCT values of `keyCol` with
    * Levenshtein distance <= maxDist (1 or 2), via deletion
    * neighborhoods — right for short keys (<= ~32 chars; variants grow
    * O(len^maxDist)). Columns: (key_a, key_b, dist). Null keys are
    * ignored. */
  def selfJoin(df: DataFrame, keyCol: String, maxDist: Int = 2): DataFrame =
    verify(neighborhoodCandidates(distinctKeys(df, keyCol), maxDist),
      maxDist)

  /** [[selfJoin]]'s long-key production form: deletion neighborhoods
    * for keys of length <= `maxKeyLen`, PassJoin segments for keys of
    * length >= maxKeyLen − maxDist + 1 (the blocks overlap so boundary-
    * straddling pairs are caught), one shared distinct + verify.
    * Same output contract: (key_a, key_b, dist), key_a < key_b. */
  def selfJoinHybrid(df: DataFrame, keyCol: String, maxDist: Int = 2,
      maxKeyLen: Int = 32): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"blocking supports maxDist 1 or 2, got $maxDist")
    // segment strings need length >= maxDist+1 everywhere in the long
    // block, whose shortest member is maxKeyLen - maxDist + 1
    require(maxKeyLen >= 2 * maxDist + 2,
      s"maxKeyLen $maxKeyLen too small for maxDist $maxDist blocks")
    val keys = distinctKeys(df, keyCol)
    val short = keys.filter(length(col("key")) <= maxKeyLen)
    val long = keys.filter(length(col("key")) >= maxKeyLen - maxDist + 1)
    verify(
      neighborhoodCandidates(short, maxDist)
        .unionByName(segmentCandidates(long, maxDist)),
      maxDist)
  }

  private def distinctKeys(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).as("key"))
      .filter(col("key").isNotNull).distinct()

  private def verify(cands: DataFrame, maxDist: Int): DataFrame =
    cands.distinct()
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("dist") <= maxDist)

  /** Deletion-neighborhood candidate pairs (key_a < key_b), unverified.
    * All strings reachable by deleting <= maxDist characters, deduped
    * per key (different deletion positions can coincide). The length
    * guards matter: sequence(0, -1) DESCENDS in Spark, so an empty key
    * would otherwise fabricate variants. */
  private def neighborhoodCandidates(keys: DataFrame,
      maxDist: Int): DataFrame = {
    val empty = array().cast("array<string>")
    val del1 = when(length(col("key")) >= 1,
      transform(sequence(lit(0), length(col("key")) - 1),
        i => delete1(col("key"), i))).otherwise(empty)
    val variants0 = array(col("key"))
    val variants =
      if (maxDist == 1) array_distinct(concat(variants0, del1))
      else {
        // i < j: delete positions i and j (0-based) in one pass
        val del2 = when(length(col("key")) >= 2,
          flatten(transform(
            sequence(lit(0), length(col("key")) - 2),
            i => transform(sequence(i + 1, length(col("key")) - 1),
              j => delete2(col("key"), i, j))))).otherwise(empty)
        array_distinct(concat(variants0, del1, del2))
      }
    val postings = keys
      .select(col("key"), explode(variants).as("v"))
    postings.select(col("key").as("key_a"), col("v"))
      .join(postings.select(col("key").as("key_b"), col("v")), "v")
      .filter(col("key_a") < col("key_b"))
      .filter(abs(length(col("key_a")) - length(col("key_b"))) <= maxDist)
      .select(col("key_a"), col("key_b"))
  }

  /** PassJoin candidate pairs (key_a < key_b), unverified. Every key is
    * both INDEX (its d+1 segments under the even partition scheme —
    * first segments length ⌊l/(d+1)⌋, last l mod (d+1) segments one
    * char longer) and PROBE (for each target length ls in [len−d, len]
    * within the block, the substrings of the multi-match-aware window);
    * candidates are probe-substring == index-segment matches on
    * (substring, segment index, target length). The probe is always the
    * >=-length side, so each cross-length pair generates once; equal
    * lengths generate both directions and collapse in the caller's
    * distinct. All generation is zero-shuffle array expressions. */
  private def segmentCandidates(keys: DataFrame, maxDist: Int): DataFrame = {
    val tau = maxDist
    val nseg = tau + 1
    val kk = keys.select(col("key"), length(col("key")).as("len"))
    // index postings: (v = segment text, j = segment index, ls = length);
    // posexplode carries the segment index alongside the text
    val idx = kk.select(col("key").as("key_s"), col("len").as("ls"),
        posexplode(transform(sequence(lit(0), lit(tau)), j => {
          val rem = pmod(col("len"), lit(nseg))
          val base = (col("len") - rem) / lit(nseg)
          val start = (lit(1) + base * j +
            greatest(lit(0), j - (lit(nseg) - rem))).cast("int")
          val slen = (base +
            when(j >= lit(nseg) - rem, 1).otherwise(0)).cast("int")
          col("key").substr(start, slen)
        })).as(Seq("j", "v")))
      .select(col("key_s"), col("ls"), col("j"), col("v"))
    // probe postings: for each target length ls and segment j, the
    // substrings of r in the multi-match-aware window
    //   [p − j, p + j] ∩ [p + Δ − (τ−j), p + Δ + (τ−j)] ∩ [1, lr−l+1]
    // (0-based j; Li et al. ICDE 2011 §4.2)
    val emptyPp =
      array().cast("array<struct<v:string,j:int,ls:int>>")
    val prb = kk.select(col("key").as("key_r"), col("len").as("lr"),
        explode(flatten(transform(
          sequence(greatest(lit(nseg), col("len") - tau), col("len")),
          ls => {
            val rem = pmod(ls, lit(nseg))
            val base = ((ls - rem) / lit(nseg)).cast("int")
            val delta = col("len") - ls
            flatten(transform(sequence(lit(0), lit(tau)), j => {
              val p = lit(1) + base * j +
                greatest(lit(0), j - (lit(nseg) - rem))
              val slen = (base +
                when(j >= lit(nseg) - rem, 1).otherwise(0)).cast("int")
              val lo = greatest(lit(1), p - j,
                p + delta - (lit(tau) - j)).cast("int")
              val hi = least(col("len") - slen + 1, p + j,
                p + delta + (lit(tau) - j)).cast("int")
              when(hi >= lo,
                transform(sequence(lo, hi), st =>
                  struct(col("key").substr(st, slen).as("v"),
                    j.cast("int").as("j"), ls.cast("int").as("ls"))))
                .otherwise(emptyPp)
            }))
          }))).as("pp"))
      .select(col("key_r"), col("pp.v").as("v"), col("pp.j").as("j"),
        col("pp.ls").as("ls"))
    prb.join(idx, Seq("v", "j", "ls"))
      .filter(col("key_s") =!= col("key_r"))
      .select(least(col("key_s"), col("key_r")).as("key_a"),
        greatest(col("key_s"), col("key_r")).as("key_b"))
  }

  /** `s` with 0-based character `i` removed. */
  private def delete1(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i), s.substr(i + 2, length(s) - i - 1))

  /** `s` with 0-based characters `i < j` removed. */
  private def delete2(s: Column, i: Column, j: Column): Column =
    concat(s.substr(lit(1), i),
      s.substr(i + 2, j - i - 1),
      s.substr(j + 2, length(s) - j - 1))
}
