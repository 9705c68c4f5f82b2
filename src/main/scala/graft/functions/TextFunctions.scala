package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * Everything here is a pure `Column` expression built from Spark's
  * higher-order functions — evaluated per row, no UDFs, no shuffles, so
  * each op scales linearly with the corpus and stays inside codegen'd
  * stages wherever Spark supports it.
  *
  * Portability note: the hash primitive is `md5` (lowercase hex), which
  * DuckDB computes identically — the correctness oracles rely on that.
  * Min-hashing uses the *lexicographic* order of md5 hex strings as the
  * hash total order, which is engine-independent.
  */
object TextFunctions {

  /** Whitespace tokenization (driver `documents.text` is single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** Sliding-window reduce over an array: the w-wide windows of `arr`
    * combined with `f`, expressed as a zip_with chain over w shifted
    * slices. Crucially the lambdas only touch lambda variables — an
    * `element_at(arr, i)` inside a HOF lambda would re-evaluate `arr`'s
    * whole expression tree per element (quadratic; this exact trap made
    * the first shingle implementation ~50× slower). */
  private def slidingReduce(arr: Column, w: Int,
      f: (Column, Column) => Column): Column = {
    val cnt = size(arr) - (w - 1)
    if (w == 1) arr
    else when(cnt > 0,
      (0 until w).map(k => slice(arr, lit(k + 1), cnt)).reduce((a, b) => zip_with(a, b, f)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word-level n-gram shingles joined with '_'.
    * Guarded: fewer than n tokens → empty array. */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(shinglesOrdered(toks, n))

  /** One MinHash signature value: min over shingles of md5(seed|shingle).
    * Lexicographic min over hex strings = an engine-portable hash order. */
  def minhashSig(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, t => md5(concat(lit(s"$seed|"), t))))

  /** 32-bit SimHash over *distinct* tokens, returned as a '0'/'1' string.
    * Bit j = sign of Σ_tokens (j-th md5 nibble ≥ '8' ? +1 : -1); ties → 1.
    * Distinct tokens keep the per-row cost at O(32·|vocab ∩ doc|). */
  def simhash32(toks: Column): Column = {
    // one md5 per distinct token, one aggregate pass accumulating all 32
    // bit-sums in an int array (no outer-array refs in any lambda)
    val hx = transform(array_distinct(toks), t => md5(t))
    val zeros = transform(sequence(lit(1), lit(32)), _ => lit(0))
    val sums = aggregate(hx, zeros,
      (acc, h) => zip_with(acc, sequence(lit(1), lit(32)),
        (a, j) => a + when(h.substr(j, lit(1)) >= "8", 1).otherwise(-1)))
    array_join(transform(sums, v => when(v >= 0, "1").otherwise("0")), "")
  }

  /** Winnowing document fingerprint: k-gram md5 hashes, sliding-window (w)
    * minima, deduplicated. Returns the distinct fingerprint array.
    * (S. Schleimer et al., "Winnowing: Local Algorithms for Document
    * Fingerprinting", SIGMOD 2003.)
    *
    * HOFs are CodegenFallback — the whole projection runs interpreted with
    * no common-subexpression elimination, so a composed one-shot column
    * here re-evaluates the hash subtree ~6× per row. Hot paths should
    * stage it: `.withColumn("hs", kgramHashes(toks, k))` then
    * [[winnowFromHashes]] over the materialized attribute (CollapseProject
    * keeps non-cheap multiply-referenced projections separate). */
  def winnowFingerprints(toks: Column, k: Int, w: Int): Column =
    winnowFromHashes(kgramHashes(toks, k), w)

  /** md5 over each ordered k-gram shingle. */
  def kgramHashes(toks: Column, k: Int): Column =
    transform(shinglesOrdered(toks, k), t => md5(t))

  /** Sliding-window (w) minima over a hash array, deduplicated. */
  def winnowFromHashes(hashes: Column, w: Int): Column =
    when(size(hashes) >= w,
      array_distinct(slidingReduce(hashes, w, (a, b) => least(a, b))))
      .otherwise(array_distinct(hashes))

  /** Ordered (non-distinct) n-gram shingles — winnowing needs positions. */
  def shinglesOrdered(toks: Column, n: Int): Column =
    slidingReduce(toks, n, (a, b) => concat(a, lit("_"), b))

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(toks: Column): Column =
    (size(filter(toks, t => t.isin(enStop: _*))).cast("double") / size(toks))

  /** n-gram-heuristic language guess: stopword-profile score thresholding.
    * On the synthetic corpus this is a plumbing exercise — the heuristic is
    * deterministic and oracle-mirrored, not linguistically serious. */
  def langGuess(toks: Column): Column =
    when(stopwordRatio(toks) >= 0.05, "en").otherwise("unk")

  /** Stopword (function-word) profiles for the n-gram-heuristic language
    * identifier — the classic cheap langid: count each language's
    * high-frequency function words and take the argmax. Declared order is
    * the deterministic tie-break. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "den", "zu"))

  /** Occurrences (with multiplicity) of any profile word in the tokens. */
  def profileScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** Deterministic argmax over (language, score) in declared order: the
    * first language whose score is nonzero and >= every LATER score wins
    * (an earlier language with a larger score would have won already);
    * all-zero scores → 'unk'. */
  def langPredict(scores: Seq[(String, Column)]): Column =
    scores.zipWithIndex.foldRight(lit("unk")) { case (((lang, c), i), acc) =>
      val laters = scores.drop(i + 1).map(_._2)
      when(laters.foldLeft(c > 0)((p, l) => p && c >= l), lang).otherwise(acc)
    }

  /** Quality-scoring features: token counts, duplication, lengths. */
  def nTokens(toks: Column): Column = size(toks).cast("long")
  def nDistinctTokens(toks: Column): Column = size(array_distinct(toks)).cast("long")
  def dupTokenRatio(toks: Column): Column =
    lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks)
  def avgTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)

  /** Within-doc repetition signals — the Gopher repetition-filter axis
    * (Rae et al. 2021, arXiv:2112.11446, Table A1), adapted to
    * occurrence-count fractions over word n-grams. Both take an
    * already-STAGED ordered n-gram column ([[shinglesOrdered]] behind a
    * `.withColumn`): passing a raw expression would re-evaluate its whole
    * tree per lambda element (see [[winnowFingerprints]]'s staging note).
    * Per-row array math only — zero shuffle, linear in the corpus. */

  /** Fraction of n-gram occurrences that repeat an earlier one:
    * 1 − distinct/total. Docs too short for any n-gram → 0. */
  def dupNgramRatio(ng: Column): Column =
    when(size(ng) > 0,
      lit(1.0) - size(array_distinct(ng)).cast("double") / size(ng))
      .otherwise(lit(0.0))

  /** Share of n-gram occurrences taken by the single most frequent
    * n-gram. O(distinct × total) per row — bounded by document length.
    * Docs too short for any n-gram → 0. */
  def topNgramShare(ng: Column): Column =
    when(size(ng) > 0,
      array_max(transform(array_distinct(ng),
        u => size(filter(ng, v => v === u)))).cast("double") / size(ng))
      .otherwise(lit(0.0))

  /** BPE-ish subword count: runs of letters, runs of digits, or any other
    * non-space char (the usual pre-tokenizer regex family). Production
    * form is the native one-pass byte scan (regex alternation over
    * multi-KB texts measured ~60% of x65's whole wall); the regex twin
    * below is the oracle-shaped reference, spec-proved equal. */
  def bpeishTokenCount(text: Column): Column =
    graft.expressions.TextExpressions.bpeishTokenCountNative(text)

  /** The regex formulation `bpeishTokenCount` is proved against. */
  def bpeishTokenCountRegex(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")

  /** PII redaction patterns (kind -> regex). Deliberately restricted to
    * constructs with identical semantics in Java regex (Spark) and RE2
    * (DuckDB oracle): character classes, bounded repetition, \b — no
    * backrefs, no lookaround. Replacement token is `<KIND>`. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "phone" -> "\\+[0-9]{7,15}",
    "ipv4" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b")

  /** Mask every PII pattern occurrence — the standard pre-training
    * scrub. Pure regexp_replace cascade: codegen'd, zero shuffle. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (kind, pat)) =>
      regexp_replace(c, pat, s"<${kind.toUpperCase}>")
    }
}
