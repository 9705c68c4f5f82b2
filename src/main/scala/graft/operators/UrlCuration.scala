package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation — the C4-style provenance axis of corpus curation
  * (Raffel et al., "Exploring the Limits of Transfer Learning with a
  * Unified Text-to-Text Transformer", JMLR 2020, §2.2 clean-up rules;
  * Penedo et al., "The RefinedWeb Dataset", NeurIPS 2023 §3.1 URL
  * filtering): canonicalize document URLs, key every doc to its
  * registrable domain, and compute the per-domain health stats
  * (volume, URL duplication, text duplication) that drive domain
  * block/allow lists and the anti-domination cap.
  *
  * Canonicalization is the standard deterministic normal form:
  * lowercase, scheme stripped, leading `www.` stripped, query string and
  * fragment stripped, trailing slashes stripped. Applied per-row with
  * codegen'd string/regex expressions — zero shuffle.
  *
  * Scale shape: stats are one hash aggregation on the domain key
  * (map-side combined; countDistinct goes through Spark's two-phase
  * expand); the anti-domination cap is [[Sampling.capPerGroup]]'s single
  * window shuffle on the same key, and the domain-keyed agg-to-agg join
  * broadcasts (domains ≪ docs). Domain skew (one domain = half the
  * corpus) is exactly what the cap bounds — the window ranks then drops,
  * it never materializes a per-domain list.
  */
object UrlCuration {

  /** Canonical URL normal form (see object doc). */
  def canonicalUrl(url: Column): Column = {
    val noFragQuery = substring_index(substring_index(url, "#", 1), "?", 1)
    val noScheme =
      regexp_replace(lower(noFragQuery), "^[a-z][a-z0-9+.-]*://", "")
    regexp_replace(regexp_replace(noScheme, "^www\\.", ""), "/+$", "")
  }

  /** Registrable host of a canonical URL: path and port stripped. */
  def domainOf(canonUrl: Column): Column =
    substring_index(substring_index(canonUrl, "/", 1), ":", 1)

  /** Per-domain curation stats plus the anti-domination cap verdict:
    * (domain, n_docs, n_urls, dup_ratio, n_kept, kept_id_sum) where
    * n_urls counts distinct canonical URLs, dup_ratio is the exact-text
    * duplicate share, and n_kept/kept_id_sum describe the ≤ `capN`
    * survivors [[Sampling.capPerGroup]] selects by deterministic
    * md5-rank (the id-sum pins the selected SET, not just its size, so
    * an oracle verifies the hash-rank selection end-to-end). */
  def domainStats(df: DataFrame, urlCol: String, textCol: String,
      idCol: String, capN: Int): DataFrame = {
    val clash = df.columns.toSeq
      .intersect(Seq("domain", "__curl", "n_docs", "n_urls", "dup_ratio",
        "n_kept", "kept_id_sum"))
    require(clash.isEmpty,
      s"domainStats uses ${clash.mkString(", ")} internally — " +
        "rename or drop those input columns first")
    val keyed = df
      .withColumn("__curl", canonicalUrl(col(urlCol)))
      .withColumn("domain", domainOf(col("__curl")))
    val kept = Sampling.capPerGroup(keyed, "domain", idCol, capN)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_kept"),
        sum(col(idCol)).cast("long").as("kept_id_sum"))
    keyed.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__curl")).as("n_urls"),
        round(lit(1.0) - countDistinct(md5(col(textCol))).cast("double")
          / count(lit(1)), 4).as("dup_ratio"))
      .join(kept, Seq("domain"))
  }
}
