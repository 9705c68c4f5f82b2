package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity self-join over a short string
  * key — the entity-resolution / fuzzy-matching primitive (approximate
  * string joins: Gravano et al., VLDB 2001): every pair of distinct keys
  * with ed(a, b) <= maxDist, exactly.
  *
  * Blocking is by DELETION NEIGHBORHOOD (FastSS — Bocek et al.,
  * U. Zurich TR ifi-2007.02; Mor & Fraenkel, CACM 1982): index every
  * string under each variant obtainable by deleting up to `maxDist`
  * characters. If ed(a, b) <= d, an optimal alignment's common
  * subsequence is reachable from a by deleting its substituted/deleted
  * positions (<= d of them) and from b by deleting its
  * substituted/inserted positions (<= d) — so a and b share a variant
  * and MUST collide in the index: recall-complete. A shared variant only
  * bounds ed <= 2d from below, so candidates are verified with the true
  * `levenshtein` (codegen'd) before anything is emitted.
  *
  * Scale shape: variant generation is a zero-shuffle array expression
  * per row (O(len^d) variants per key — the classic space-for-candidates
  * trade; for keys beyond ~32 chars or d > 2, segment-based blocking à
  * la PassJoin (Li et al., ICDE 2011) bounds the index linearly and
  * would slot into the same candidate→verify frame). The only shuffles
  * are the variant-keyed self-join and the candidate distinct; the
  * length filter |len(a) − len(b)| <= d prunes before verification.
  * Candidate volume tracks true-match volume — high-df variants are
  * short deletion remnants of near-identical keys, exactly the
  * collisions the join wants. */
object EditDistJoin {

  /** All (key_a < key_b) pairs of DISTINCT values of `keyCol` with
    * Levenshtein distance <= maxDist (1 or 2). Columns:
    * (key_a, key_b, dist). Null keys are ignored. */
  def selfJoin(df: DataFrame, keyCol: String, maxDist: Int = 2): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood blocking supports maxDist 1 or 2, got $maxDist")
    val keys = df.select(col(keyCol).as("key"))
      .filter(col("key").isNotNull).distinct()
    // all strings reachable by deleting <= maxDist characters, deduped
    // per key (different deletion positions can coincide). The length
    // guards matter: sequence(0, -1) DESCENDS in Spark, so an empty key
    // would otherwise fabricate variants
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
    val cands = postings.select(col("key").as("key_a"), col("v"))
      .join(postings.select(col("key").as("key_b"), col("v")), "v")
      .filter(col("key_a") < col("key_b"))
      .filter(abs(length(col("key_a")) - length(col("key_b"))) <= maxDist)
      .select(col("key_a"), col("key_b"))
      .distinct()
    cands
      .withColumn("dist",
        levenshtein(col("key_a"), col("key_b")).cast("long"))
      .filter(col("dist") <= maxDist)
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
