package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.operators.{AsOfJoin, Audio, Bleu, Chrf, Dedup, Multimodal, RangeJoin, SegmentDedup, Similarity}
import graft.streaming.EventStreams

/** Training-data pipeline operators as verifiable queries: deduplication
  * (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding cosine),
  * similarity search, text analysis, fingerprinting, sessionization,
  * streaming aggregation, multimodal metadata.
  *
  * Oracle portability tricks (see also Registry scaladoc): the hash
  * primitive is md5 hex (identical in DuckDB), MinHash uses lexicographic
  * order over md5 hex strings, cosine values are rounded to 4 decimals
  * before any ranking/thresholding so cross-engine summation-order noise
  * cannot flip results.
  */
object PipelineQueries extends QueryPack {

  // DuckDB SQL fragments shared by several oracles -----------------------
  /** 4-gram distinct shingle list over single-spaced text. */
  private val shingleSql =
    """list_distinct(list_transform(range(len(string_split(text,' '))-3),
       i -> string_split(text,' ')[i+1]||'_'||string_split(text,' ')[i+2]||'_'||string_split(text,' ')[i+3]||'_'||string_split(text,' ')[i+4]))"""

  private def minhashSigSql(seed: Int): String =
    s"list_aggregate(list_transform(s, t -> md5('$seed|'||t)), 'min')"

  /** Shared by x71 (batch) and x72 (streaming ledger): exact top-8 of the
    * synthesized Zipf key over events + hardcoded-true sketch verdicts —
    * one oracle pinning both sketch paths to one semantics (the
    * x50/x58 ledger precedent). */
  private val heavyHittersOracleSql =
    """WITH tm AS (SELECT CASE WHEN event_id % 2 = 0
        THEN 'h' || CAST(length(bin((event_id // 2) % 1024 + 1)) - 1 AS VARCHAR)
        ELSE 't' || CAST(event_id AS VARCHAR) END AS term
      FROM events),
    c AS (SELECT term, count(*) AS n_exact FROM tm GROUP BY term),
    tot AS (SELECT count(*) AS n FROM tm)
    SELECT term, n_exact, n_exact * 129 > n AS qualifies,
      true AS sketch_ok
    FROM c, tot ORDER BY n_exact DESC, term LIMIT 8"""

  /** Shared by x87 (batch) and x94 (streaming ledger): the DuckDB-side
    * REBUILD of the whole Count-Min sketch (depth 4 × width 1024, the
    * same md5 bucket arithmetic) + exact top-8 estimates and verdicts.
    * CM counters are additive, so the streaming ledger telescopes to
    * this exact sketch — one oracle pins both paths (the x71/x72
    * precedent). */
  /** x99's blocklist: lengths 1–3, "slow" ⊂ "slow query" (overlap
    * semantics exercised), "leak" absent from the corpus vocabulary
    * (the zero-hit path). */
  private val blocklistPhrases = Seq(
    "slow", "table scan", "slow query", "big table scan", "leak")

  /** One phrase's positional hit count over the `ts` token array as
    * DuckDB SQL (shared by x99's oracle and x200's funnel stage). */
  private def phraseCntSql(p: String): String = {
    val ws = p.split(" ")
    val conj = ws.zipWithIndex
      .map { case (w, j) => s"ts[i+${j + 1}] = '$w'" }.mkString(" AND ")
    s"len(list_filter(range(len(ts)-${ws.length - 1}), i -> $conj))"
  }

  /** x99 oracle: per-phrase positional counts + the first-max tie rule,
    * generated from [[blocklistPhrases]] so query and oracle can never
    * drift. */
  private val blocklistOracleSql: String = {
    val n = blocklistPhrases.length
    def cnt(p: String): String = {
      val ws = p.split(" ")
      val conj = ws.zipWithIndex
        .map { case (w, j) => s"ts[i+${j + 1}] = '$w'" }.mkString(" AND ")
      s"len(list_filter(range(len(ts)-${ws.length - 1}), i -> $conj))"
    }
    val cols = blocklistPhrases.zipWithIndex
      .map { case (p, i) => s"${cnt(p)} AS c$i" }.mkString(", ")
    val nhits = (0 until n).map(i => s"c$i").mkString(" + ")
    val nph = (0 until n)
      .map(i => s"CASE WHEN c$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    val greatest = s"greatest(${(0 until n).map(i => s"c$i").mkString(", ")})"
    val top = s"CASE WHEN $nhits = 0 THEN NULL " +
      blocklistPhrases.zipWithIndex
        .map { case (p, i) => s"WHEN c$i = $greatest THEN '$p'" }
        .mkString(" ") + " END"
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
        FROM documents),
      c AS (SELECT doc_id, $cols FROM t)
      SELECT doc_id, CAST($nhits AS BIGINT) AS n_hits,
        CAST($nph AS BIGINT) AS n_phrases, $top AS top_phrase,
        ($nhits > 0) AS blocked
      FROM c ORDER BY doc_id"""
  }

  /** x101's oracle: regenerate the md5-seeded ±1 projections (the SRP
    * hyperplane formula, shared with srpCtes), pair consecutive ids,
    * compare 4dp cosines before/after. */
  private def jlOracleSql(m: Int, bound: Double): String = {
    def comp(p: Int) =
      s"""round(list_sum(list_transform(range(len(embedding)),
         i -> CAST(embedding[i+1] AS DOUBLE) *
           (CASE WHEN substr(md5('${p}_'||CAST(i AS VARCHAR)),1,1) >= '8'
            THEN 1.0 ELSE -1.0 END))), 4)"""
    val proj = (0 until m).map(comp).mkString("[", ", ", "]")
    def d(a: String, b: String) =
      s"list_sum(list_transform(range(len($a)), i -> CAST($a[i+1] AS DOUBLE)*CAST($b[i+1] AS DOUBLE)))"
    def cosSql(a: String, b: String) =
      s"""CASE WHEN ${d(a, a)} * ${d(b, b)} = 0 THEN 0.0
         ELSE round(${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)})), 4)
         END"""
    s"""WITH pr AS (SELECT vec_id, $proj AS proj FROM embeddings),
      pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          a.embedding AS va, b.embedding AS vb
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 2 = 0),
      j AS (SELECT p.id_a, p.id_b, p.va, p.vb, pa.proj AS pa,
          pb.proj AS pb
        FROM pairs p JOIN pr pa ON pa.vec_id = p.id_a
        JOIN pr pb ON pb.vec_id = p.id_b),
      c AS (SELECT id_a, id_b, ${cosSql("va", "vb")} AS cos_orig,
          ${cosSql("pa", "pb")} AS cos_proj FROM j)
      SELECT id_a, id_b, cos_orig, cos_proj,
        round(abs(cos_orig - cos_proj), 4) AS abs_err,
        (round(abs(cos_orig - cos_proj), 4) <= $bound) AS within_bound
      FROM c ORDER BY id_a"""
  }

  /** x104's oracle: shared 32-hash signatures, per-combo banding +
    * candidate pairs + counts vs the x86 brute-force truth; precision/
    * recall by INTEGER half-up micro-rounding (dyadic ratios like 1/128
    * land exactly on the 6dp half and double-rounding would tie-break
    * engine-dependently). */
  private def lshTuningOracleSql(numHashes: Int, grid: Seq[Int],
      threshold: Double): String = {
    val sigs = (0 until numHashes)
      .map(i => s"${minhashSigSql(i)} AS h$i").mkString(", ")
    val comboCtes = grid.map { b =>
      val r = numHashes / b
      val bands = (0 until b).map { j =>
        val key = (0 until r).map(k => s"h${j * r + k}").mkString("||")
        s"SELECT doc_id, $j AS band, $key AS key FROM sg"
      }.mkString(" UNION ALL ")
      s"""bands_$b AS ($bands),
        cand_$b AS (SELECT DISTINCT a.doc_id AS doc_a,
            b.doc_id AS doc_b
          FROM bands_$b a JOIN bands_$b b
            ON a.band = b.band AND a.key = b.key
              AND a.doc_id < b.doc_id),
        cnt_$b AS (SELECT $b AS bands, $r AS rows,
          (SELECT count(*) FROM cand_$b) AS n_cand,
          (SELECT count(*) FROM cand_$b c JOIN truth t
            ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b) AS n_found)"""
    }.mkString(",\n        ")
    val union = grid.map(b => s"SELECT * FROM cnt_$b")
      .mkString(" UNION ALL ")
    val sCurve = grid.map { b =>
      val r = numHashes / b
      val v = BigDecimal.valueOf(math.pow(1.0 / b, 1.0 / r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      s"WHEN bands = $b THEN $v"
    }.mkString(" ")
    s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents
          WHERE len(string_split(text,' ')) >= 4),
      sg AS (SELECT doc_id, s, $sigs FROM tk),
      ex AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
      sz AS (SELECT doc, count(*) AS n FROM ex GROUP BY doc),
      co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
             FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
             GROUP BY a.doc, b.doc),
      truth AS (SELECT doc_a, doc_b
        FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
        WHERE CAST(common AS DOUBLE)/(sa.n + sb.n - common)
          >= $threshold),
      $comboCtes,
      u AS ($union)
      SELECT CAST(bands AS BIGINT) AS bands, CAST(rows AS BIGINT) AS rows,
        (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
        CAST(n_cand AS BIGINT) AS n_cand,
        CAST(n_found AS BIGINT) AS n_found,
        CASE WHEN n_cand = 0 THEN NULL ELSE
          CAST((n_found*2000000 + n_cand) // (2*n_cand) AS DOUBLE)
            / 1000000.0 END AS precision,
        CASE WHEN (SELECT count(*) FROM truth) = 0 THEN NULL ELSE
          CAST((n_found*2000000 + (SELECT count(*) FROM truth))
            // (2*(SELECT count(*) FROM truth)) AS DOUBLE)
            / 1000000.0 END AS recall,
        CASE $sCurve END AS s_curve
      FROM u ORDER BY bands DESC"""
  }

  /** The CM rebuild over `events` under an optional WHERE — "" is the
    * x87/x94 whole-table oracle; x211 passes the retraction's clean-set
    * predicate (CM linearity: the netted ledger must equal the sketch
    * built from the clean events, so ONE oracle shape pins all three). */
  private def countMinOracleSqlOver(eventsFilter: String): String =
    s"""WITH tm AS (SELECT CASE WHEN event_id % 2 = 0
        THEN 'h' || CAST(length(bin((event_id // 2) % 1024 + 1)) - 1 AS VARCHAR)
        ELSE 't' || CAST(event_id AS VARCHAR) END AS term
        FROM events $eventsFilter),
      c AS (SELECT term, count(*) AS n_exact FROM tm GROUP BY term),
      top AS (SELECT term, n_exact FROM c
              ORDER BY n_exact DESC, term LIMIT 8),
      bk AS (SELECT d.range AS d,
          ('0x'||substr(md5(d.range||':'||term),1,8))::BIGINT % 1024
            AS bucket,
          count(*) AS cnt
        FROM tm, range(4) d GROUP BY 1, 2),
      e AS (SELECT t.term, t.n_exact, min(bk.cnt) AS est
        FROM top t JOIN bk ON bk.bucket =
          ('0x'||substr(md5(bk.d||':'||t.term),1,8))::BIGINT % 1024
        GROUP BY t.term, t.n_exact)
      SELECT term, n_exact, est,
        true AS never_under, true AS overcount_ok
      FROM e ORDER BY n_exact DESC, term"""

  private val countMinOracleSql = countMinOracleSqlOver("")

  /** Shared IVF scale parameters (x14/x62/the x14 volume counter — ONE
    * derivation so the slope-gate pin cannot drift from the entries):
    * query panel 1-in-panelMod capped ~200; nlist ∝ corpus with cells
    * held ~1000 rows, CAPPED at 4096 so the k-means problem stays
    * bounded (nProbe preserves the probed FRACTION, so candidate volume
    * is panel × fraction × n regardless of nlist — the cap only sizes
    * training and granularity); the k-means training sample scales WITH
    * nlist (20 rows/centroid — the k ≪ sample invariant a fixed ~2000
    * cap would break at ~2M vectors, degenerating kppSeeds to duplicate
    * seeds: ADVICE r15 item 3). Returns (panelMod, nlist, trainMod). */
  private def ivfScaleParams(n: Long): (Long, Int, Long) = {
    val nlist = math.max(10L, math.min(n / 1000L, 4096L)).toInt
    (math.max(10L, n / 200L), nlist,
      math.max(1L, n / math.max(2000L, 20L * nlist)))
  }

  /** Measured VARIABLE-LEG candidate volumes for the volume-faithful
    * slope stories (ADVICE r15 item 4): "candidate volume is
    * ~10×/decade by construction" was prose — these COUNT it.
    * graft.Slopes runs each counter at sf0.1 and the 10× fixture and
    * screens the entry when the measured ratio leaves [5, 13] (the
    * construction claim is ~10×; 12.5 = 100/2³ is the worst
    * integer-granularity decade for the adaptive-key entry). Each
    * counter reuses the entry's OWN parameter derivation/operator
    * stage, so entry and pin cannot drift apart. */
  val volumeCounters: Map[String,
      (org.apache.spark.sql.SparkSession, String) => Long] = Map(
    // x14: exact leg = panel × corpus; ADC leg = the probed cell rows
    // ivfScanStats measures (ivfTopK's candidate volume exactly)
    "x14_ivf_ann" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").persist()
      val n = e.count()
      val (panelMod, nlist, trainMod) = ivfScaleParams(n)
      val nProbe = math.max(3, 3 * nlist / 10)
      val eq = e.filter(col("vec_id") % panelMod === 0)
      val cents = Similarity.trainKMeans(
        e.filter(col("vec_id") % trainMod === 0), "vec_id", "embedding",
        k = nlist, iters = 5)
      val scanned = Similarity.ivfScanStats(e, eq, cents, "vec_id",
        "embedding", nProbe).select(col("scanned_pairs")).first().getLong(0)
      val panel = eq.count()
      e.unpersist(blocking = false)
      panel * n + scanned
    }),
    // x86: the prefix-filter collision pairs the verify join moves
    "x86_setsim_exact_join" -> ((s, dir) =>
      graft.operators.SetSimJoin.prefixCandidateCount(
        t(s, dir, "documents"), "doc_id", "text", n = 4, threshold = 0.5)),
    // x43: the scaled-key band collisions (the adaptive-width bound)
    "x43_embedding_dedup_keeplist" -> ((s, dir) =>
      Dedup.embeddingLshScaledCandidateCount(t(s, dir, "embeddings"),
        "vec_id", "embedding", dim = 64, numBands = 12)))

  /** The synthesized Zipf-ish term key (see x71's comment). */
  private def zipfTerm = when(col("event_id") % 2 === 0,
    concat(lit("h"),
      (length(bin(expr("event_id DIV 2") % 1024 + 1)) - 1).cast("string")))
    .otherwise(concat(lit("t"), col("event_id").cast("string")))

  /** Deterministic pixel-image fixture spec shared by x13/x49: format
    * cycles png/jpeg/gif by `doc_id % 3`; dims 8..64 × 8..56; grays —
    * PNG gets two independent bands (lossless, any value), JPEG a
    * CONSTANT bin-center gray 16+32k (so its ±2 lossy round-trip stays
    * in-bin), GIF a constant arbitrary gray (palette round-trip is
    * exact). [[pixelFixtureSpecSql]] is the same arithmetic in DuckDB. */
  private def pixelFixtureSpec(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val m3 = col("doc_id") % 3
    docs.select(col("doc_id"),
      element_at(typedlit(Seq("png", "jpeg", "gif")),
        m3.cast("int") + 1).as("fmt"),
      (lit(8) + pmod(col("doc_id") * 7 + col("n_chars"), lit(57)))
        .cast("int").as("w"),
      (lit(8) + pmod(col("doc_id") * 13 + col("n_chars") * 3, lit(49)))
        .cast("int").as("h"),
      when(m3 === 1, lit(16) + pmod(col("doc_id") * 5 + 3, lit(8)) * 32)
        .when(m3 === 2, pmod(col("doc_id") * 53 + 7, lit(256)))
        .otherwise(pmod(col("doc_id") * 37 + 11, lit(256)))
        .cast("int").as("g_top"),
      when(m3 === 1, lit(16) + pmod(col("doc_id") * 5 + 3, lit(8)) * 32)
        .when(m3 === 2, pmod(col("doc_id") * 53 + 7, lit(256)))
        .otherwise(pmod(col("doc_id") * 59 + 23, lit(256)))
        .cast("int").as("g_bot"))
  }

  /** DuckDB twin of [[pixelFixtureSpec]] (format column omitted — the
    * oracles check decoded pixels, which don't depend on the container). */
  private val pixelFixtureSpecSql =
    """SELECT doc_id AS id,
      8 + (doc_id*7 + n_chars) % 57 AS w,
      8 + (doc_id*13 + n_chars*3) % 49 AS h,
      CASE WHEN doc_id % 3 = 1 THEN 16 + ((doc_id*5 + 3) % 8) * 32
           WHEN doc_id % 3 = 2 THEN (doc_id*53 + 7) % 256
           ELSE (doc_id*37 + 11) % 256 END AS g1,
      CASE WHEN doc_id % 3 = 1 THEN 16 + ((doc_id*5 + 3) % 8) * 32
           WHEN doc_id % 3 = 2 THEN (doc_id*53 + 7) % 256
           ELSE (doc_id*59 + 23) % 256 END AS g2
      FROM documents"""

  /** n-gram distinct shingle list for arbitrary n (the 4-gram constant
    * above predates this; kept for oracle-text stability). */
  private def shingleSqlN(n: Int): String = {
    val parts = (1 to n).map(j => s"string_split(text,' ')[i+$j]")
      .mkString("||'_'||")
    s"list_distinct(list_transform(range(len(string_split(text,' '))-${n - 1}), i -> $parts))"
  }

  /** Two-batch incremental-dedup ledger oracle, shared by x50 (batch,
    * max-doc-id cursor) and x58 (streaming, offset-log cursor) — the two
    * mechanisms implement the same semantics, so one from-scratch
    * recomputation checks both: batches split at (min+max)/2 of doc_id,
    * batch-1 verdicts by the in-batch bucket-min rule, batch-2 verdicts
    * against batch-1's KEPT postings plus its own peers, shingleless
    * docs always kept. */
  private lazy val minhashLedgerOracleSql: String = {
    val sigs = (0 until 8).map(i => s"${minhashSigSql(i)} AS h$i").mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id AS doc, $b AS band, h${2 * b}||h${2 * b + 1} AS key FROM sg")
      .mkString(" UNION ALL ")
    s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents
          WHERE len(string_split(text,' ')) >= 4),
      sg AS (SELECT doc_id, s, $sigs FROM tk),
      posts AS ($bands),
      sp AS (SELECT (min(doc_id) + max(doc_id))//2 AS v FROM documents),
      b1 AS (SELECT p.* FROM posts p, sp WHERE p.doc <= sp.v),
      b1bad AS (SELECT DISTINCT a.doc FROM b1 a JOIN b1 b
                ON a.band = b.band AND a.key = b.key AND b.doc < a.doc),
      b1v AS (SELECT doc, doc NOT IN (SELECT doc FROM b1bad) AS kept
              FROM (SELECT DISTINCT doc FROM b1)),
      hist AS (SELECT DISTINCT band, key FROM b1 JOIN b1v USING (doc)
               WHERE kept),
      b2 AS (SELECT p.* FROM posts p, sp WHERE p.doc > sp.v),
      b2bad AS (SELECT DISTINCT a.doc FROM b2 a JOIN b2 b
                ON a.band = b.band AND a.key = b.key AND b.doc < a.doc
                UNION
                SELECT DISTINCT a.doc FROM b2 a JOIN hist h
                ON a.band = h.band AND a.key = h.key),
      b2v AS (SELECT doc, doc NOT IN (SELECT doc FROM b2bad) AS kept
              FROM (SELECT DISTINCT doc FROM b2)),
      led AS (SELECT * FROM b1v UNION ALL SELECT * FROM b2v
              UNION ALL
              SELECT doc_id, true FROM documents
              WHERE len(string_split(text,' ')) < 4)
    SELECT led.doc AS doc_id, led.kept,
      CAST(CASE WHEN led.doc <= sp.v THEN 1 ELSE 2 END AS BIGINT) AS batch
    FROM led, sp ORDER BY doc_id"""
  }

  /** Ledger-purge + re-admission oracle (x208): one-batch ledger over
    * the full corpus, the x115/x205 delete list, purge = drop the ids'
    * rows, then the deleted docs' TEXTS re-submitted under new ids
    * (+10⁷) and judged against the PURGED kept postings — copies of
    * purged kept docs re-enter, copies whose original blocker survives
    * stay dropped, within-batch peers collapse by the bucket-min rule. */
  private lazy val ledgerPurgeOracleSql: String = {
    val sigs = (0 until 8).map(i => s"${minhashSigSql(i)} AS h$i").mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id AS doc, $b AS band, h${2 * b}||h${2 * b + 1} AS key FROM sg")
      .mkString(" UNION ALL ")
    s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents
          WHERE len(string_split(text,' ')) >= 4),
      sg AS (SELECT doc_id, s, $sigs FROM tk),
      posts AS ($bands),
      bad AS (SELECT DISTINCT a.doc FROM posts a JOIN posts b
              ON a.band = b.band AND a.key = b.key AND b.doc < a.doc),
      v AS (SELECT doc, doc NOT IN (SELECT doc FROM bad) AS kept
            FROM (SELECT DISTINCT doc FROM posts)
            UNION ALL
            SELECT doc_id, true FROM documents
            WHERE len(string_split(text,' ')) < 4),
      del AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 3),
      hist AS (SELECT DISTINCT band, key FROM posts JOIN v USING (doc)
               WHERE kept AND doc NOT IN (SELECT doc_id FROM del)),
      rposts AS (SELECT doc + 10000000 AS doc, band, key FROM posts
                 WHERE doc IN (SELECT doc_id FROM del)),
      rbad AS (SELECT DISTINCT a.doc FROM rposts a JOIN rposts b
               ON a.band = b.band AND a.key = b.key AND b.doc < a.doc
               UNION
               SELECT DISTINCT a.doc FROM rposts a JOIN hist h
               ON a.band = h.band AND a.key = h.key),
      rv AS (SELECT doc, doc NOT IN (SELECT doc FROM rbad) AS kept
             FROM (SELECT DISTINCT doc FROM rposts)
             UNION ALL
             SELECT doc_id + 10000000, true FROM documents
             WHERE doc_id % 97 = 3 AND len(string_split(text,' ')) < 4)
    SELECT d.doc_id, v.kept AS kept_before, rv.kept AS readmitted,
      true AS ledger_clean, true AS corpus_clean
    FROM del d JOIN v ON v.doc = d.doc_id
    JOIN rv ON rv.doc = d.doc_id + 10000000
    ORDER BY d.doc_id"""
  }

  /** x59's repetition thresholds — Gopher's filter family (Rae et al.
    * 2021 Table A1) with cutoffs tuned to the synthetic corpus's signal
    * distribution (p50 dup2 ≈ 0.028, p90 ≈ 0.065) so the keep verdict
    * exercises both branches. Declared above the queries list: the oracle
    * string interpolates these at object init. */
  private val (dup2Max, dup3Max, top2Max) = (0.05, 0.02, 0.05)

  /** Two-batch EMBEDDING-ledger oracle, shared by x56 (batch, max-id
    * cursor) and x64 (streaming, offset-log cursor) — the SRP analogue
    * of [[minhashLedgerOracleSql]]. */
  private lazy val srpLedgerOracleSql: String = {
    def bitSql(p: Int) =
      s"""CASE WHEN round(list_sum(list_transform(range(len(embedding)),
         i -> CAST(embedding[i+1] AS DOUBLE) *
           (CASE WHEN substr(md5('${p}_'||CAST(i AS VARCHAR)),1,1) >= '8'
            THEN 1.0 ELSE -1.0 END))), 4) >= 0 THEN '1' ELSE '0' END"""
    val bits = (0 until 64).map(p => s"${bitSql(p)} AS b$p").mkString(", ")
    val bands = (0 until 8).map(b =>
      s"SELECT doc, $b AS band, " +
        (0 until 8).map(r => s"b${b * 8 + r}").mkString("||") +
        " AS key FROM sg").mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id AS doc, embedding FROM embeddings
          WHERE len(embedding) = 64),
      sg AS (SELECT doc, $bits FROM e),
      posts AS ($bands),
      sp AS (SELECT (min(vec_id) + max(vec_id))//2 AS v FROM embeddings),
      b1 AS (SELECT p.* FROM posts p, sp WHERE p.doc <= sp.v),
      b1bad AS (SELECT DISTINCT a.doc FROM b1 a JOIN b1 b
                ON a.band = b.band AND a.key = b.key AND b.doc < a.doc),
      b1v AS (SELECT doc, doc NOT IN (SELECT doc FROM b1bad) AS kept
              FROM (SELECT DISTINCT doc FROM b1)),
      hist AS (SELECT DISTINCT band, key FROM b1 JOIN b1v USING (doc)
               WHERE kept),
      b2 AS (SELECT p.* FROM posts p, sp WHERE p.doc > sp.v),
      b2bad AS (SELECT DISTINCT a.doc FROM b2 a JOIN b2 b
                ON a.band = b.band AND a.key = b.key AND b.doc < a.doc
                UNION
                SELECT DISTINCT a.doc FROM b2 a JOIN hist h
                ON a.band = h.band AND a.key = h.key),
      b2v AS (SELECT doc, doc NOT IN (SELECT doc FROM b2bad) AS kept
              FROM (SELECT DISTINCT doc FROM b2)),
      led AS (SELECT * FROM b1v UNION ALL SELECT * FROM b2v
              UNION ALL
              SELECT vec_id, true FROM embeddings
              WHERE len(embedding) <> 64)
    SELECT led.doc AS vec_id, led.kept,
      CAST(CASE WHEN led.doc <= sp.v THEN 1 ELSE 2 END AS BIGINT) AS batch
    FROM led, sp ORDER BY vec_id"""
  }

  /** BPE training parameters shared by x52/x53 and their oracles. */
  private val bpeTopK = 50
  private val bpeRounds = 30

  /** DuckDB replica of [[graft.operators.Bpe.train]] as a recursive CTE
    * whose working table is ONE ROW holding the whole distinct-word
    * state as a list — each iteration picks the most frequent adjacent
    * symbol pair over the trainable (top-K) words via scalar list
    * lambdas (no aggregates over the recursive reference, which SQL
    * forbids) and applies it to every word with a list_reduce fold.
    * Pair keys round-trip through 'a b' strings because DuckDB 1.0
    * list_distinct rejects structs — safe, symbols are whitespace-split
    * word fragments and can never contain a space. Exposes `last`
    * (merges + final words) for composition. */
  private val bpeCtes = "WITH RECURSIVE\n" + bpeCtesBody("documents", bpeRounds)

  /** The BPE training CTE chain WITHOUT the leading WITH RECURSIVE, so
    * pipeline oracles can train on an upstream CTE (x57 trains on the
    * deduped corpus `dd`). */
  private def bpeCtesBody(fromTable: String, rounds: Int): String = s"""
    w0 AS (SELECT w, count(*) AS cnt
           FROM (SELECT unnest(string_split(text,' ')) AS w FROM $fromTable)
           GROUP BY w),
    wl AS (SELECT list({'w': w, 'cnt': cnt, 'tr': rnk <= $bpeTopK,
                        'syms': regexp_extract_all(w,'.')} ORDER BY w) AS words
           FROM (SELECT w, cnt,
                   row_number() OVER (ORDER BY cnt DESC, w) AS rnk FROM w0)),
    rec AS (
      SELECT 0 AS r, words,
        CAST([] AS STRUCT(rank BIGINT, lft VARCHAR, rgt VARCHAR,
                          pair_count BIGINT)[]) AS merges
      FROM wl
      UNION ALL
      SELECT r + 1,
        list_transform(words, wd -> {'w': wd.w, 'cnt': wd.cnt, 'tr': wd.tr,
          'syms': CASE WHEN len(wd.syms) = 0 THEN wd.syms ELSE
            list_reduce(list_transform(wd.syms, s -> [s]),
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = best.a
                               AND x[1] = best.b
                THEN list_append(list_slice(acc, 1, len(acc) - 1),
                                 best.a || best.b)
                ELSE list_append(acc, x[1]) END) END}),
        list_append(merges, {'rank': CAST(r + 1 AS BIGINT), 'lft': best.a,
          'rgt': best.b, 'pair_count': CAST(-best.npc AS BIGINT)})
      FROM (
        SELECT r, words, merges,
          CASE WHEN len(cand) = 0 THEN NULL ELSE list_sort(cand)[1] END AS best
        FROM (
          SELECT r, words, merges,
            list_transform(
              list_distinct(list_transform(pairs, p -> p.a || ' ' || p.b)),
              q -> {'npc': -CAST(list_sum(list_transform(list_filter(pairs,
                      p -> p.a = string_split(q,' ')[1]
                       AND p.b = string_split(q,' ')[2]), p -> p.c)) AS BIGINT),
                    'a': string_split(q,' ')[1],
                    'b': string_split(q,' ')[2]}) AS cand
          FROM (
            SELECT r, words, merges,
              flatten(list_transform(list_filter(words, wd -> wd.tr),
                wd -> list_transform(list_slice(wd.syms, 1, len(wd.syms) - 1),
                  (s, i) -> {'a': s, 'b': wd.syms[i + 1], 'c': wd.cnt}))) AS pairs
            FROM rec WHERE r < $rounds
          )
        )
      ) WHERE best IS NOT NULL
    ),
    last AS (SELECT merges, words FROM rec ORDER BY r DESC LIMIT 1)"""

  /** Unigram-LM training parameters shared by x209/x210 and the oracle
    * (mirrors [[graft.operators.Unigram.train]] defaults). */
  private val uniTopK = 50
  private val uniMaxLen = 3
  private val uniMulti = 40
  private val uniRounds = 2
  private val uniInf = Long.MaxValue / 4

  /** One Viterbi pass as a recursive CTE: segments `srcRel` (w, cnt)
    * under `costRel` (p, cost) into fin$tag (w, cnt, ps). The DP
    * carries a 3-deep rolling window of (cost, piece-list) pairs — a
    * recursive CTE sees only the previous iteration, and maxPieceLen
    * is 3 — and the tie rule (min cost, then LONGEST piece: the n3
    * branch wins its <= comparisons) matches the Spark fold's
    * (cost, -len) struct sort exactly. `srcRel`/`costRel` MUST be
    * MATERIALIZED CTEs: DuckDB re-evaluates a plain CTE referenced in
    * the recursive step on EVERY iteration for EVERY join — with
    * costRel's chain reaching the corpus scan that measured 25× slower
    * (4.1 s → 0.16 s per round at sf0.001). */
  private def uniViterbiCte(tag: String, srcRel: String,
      costRel: String, byteFallback: Boolean = false): String = {
    // byte fallback mirrors Unigram.BYTE_COST: a single OOV character
    // is consumable as its UTF-8 bytes at 50e6 micro-nats per byte —
    // only the length-1 candidate falls back, multi-char stays INF
    val n1Sql =
      if (byteFallback)
        s"""CASE WHEN v.c0 >= $uniInf THEN $uniInf
             ELSE v.c0 + coalesce(cr1.cost, 50000000 * octet_length(
               encode(substring(v.w, CAST(v.j + 1 AS INTEGER), 1)))) END"""
      else
        s"""CASE WHEN v.c0 >= $uniInf OR cr1.cost IS NULL THEN $uniInf
             ELSE v.c0 + cr1.cost END"""
    s"""
    vit$tag AS (
      SELECT w, cnt, 0 AS j,
        CAST(0 AS BIGINT) AS c0, CAST([] AS VARCHAR[]) AS l0,
        CAST($uniInf AS BIGINT) AS c1, CAST([] AS VARCHAR[]) AS l1,
        CAST($uniInf AS BIGINT) AS c2, CAST([] AS VARCHAR[]) AS l2
      FROM $srcRel
      UNION ALL
      SELECT w, cnt, j + 1,
        CASE pick WHEN 3 THEN n3 WHEN 2 THEN n2 ELSE n1 END,
        CASE pick WHEN 3 THEN list_append(l2, p3)
                  WHEN 2 THEN list_append(l1, p2)
                  ELSE list_append(l0, p1) END,
        c0, l0, c1, l1
      FROM (
        SELECT *, CASE WHEN n3 <= n2 AND n3 <= n1 THEN 3
                       WHEN n2 <= n1 THEN 2 ELSE 1 END AS pick
        FROM (
          SELECT v.w, v.cnt, v.j, v.c0, v.l0, v.c1, v.l1, v.c2, v.l2,
            substring(v.w, CAST(v.j + 1 AS INTEGER), 1) AS p1,
            substring(v.w, CAST(greatest(v.j, 1) AS INTEGER), 2) AS p2,
            substring(v.w, CAST(greatest(v.j - 1, 1) AS INTEGER), 3) AS p3,
            $n1Sql AS n1,
            CASE WHEN v.c1 >= $uniInf OR cr2.cost IS NULL THEN $uniInf
                 ELSE v.c1 + cr2.cost END AS n2,
            CASE WHEN v.c2 >= $uniInf OR cr3.cost IS NULL THEN $uniInf
                 ELSE v.c2 + cr3.cost END AS n3
          FROM vit$tag v
          LEFT JOIN $costRel cr1
            ON cr1.p = substring(v.w, CAST(v.j + 1 AS INTEGER), 1)
          LEFT JOIN $costRel cr2
            ON cr2.p = substring(v.w, CAST(greatest(v.j, 1) AS INTEGER), 2)
          LEFT JOIN $costRel cr3
            ON cr3.p = substring(v.w,
              CAST(greatest(v.j - 1, 1) AS INTEGER), 3)
          WHERE v.j < len(v.w)
        )
      )
    ),
    fin$tag AS (SELECT w, cnt, l0 AS ps FROM vit$tag WHERE j = len(w))"""
  }

  /** DuckDB replica of [[graft.operators.Unigram.train]] + encode: the
    * seed vocabulary (all chars of all words, coverage-floored at 1,
    * plus the top-$uniMulti head substrings), $uniRounds Viterbi-EM
    * rounds (costs = round(ln(T/c)·10⁶) micro-nats — POSITIVE so both
    * engines' half-up rounding agrees; usage recount weighted by word
    * frequency; unused multi-char pieces pruned, chars floored), the
    * final Viterbi over ALL distinct words, ids 1..V lexicographic, and
    * x204's exact corpus-assembly relations. Exposes `uda`
    * (doc_id, enc) and `finf`/`uvocab` for composition.
    *
    * `encTable` (default = fromTable) separates the TRAINING corpus
    * from the ENCODED one; `byteFallback` mirrors
    * [[graft.operators.Unigram.encodeWithByteFallback]] — the final
    * Viterbi coalesces a missing length-1 cost to 50e6·bytes and OOV
    * pieces expand to reserved byte-token ids V+1+byte via the same
    * hex arithmetic (x212). */
  private def uniCtesBody(fromTable: String, encTable: String = null,
      byteFallback: Boolean = false): String = {
    val encSrc = Option(encTable).getOrElse(fromTable)
    val roundCtes = (1 to uniRounds).map { r =>
      val prev = s"seed${r - 1}"
      s"""
    cost$r AS MATERIALIZED (SELECT p,
        CAST(round(ln(CAST((SELECT sum(c) FROM $prev) AS DOUBLE) / c)
          * 1000000) AS BIGINT) AS cost
      FROM $prev),
    ${uniViterbiCte(s"r$r", "hw", s"cost$r")},
    used$r AS (SELECT p, CAST(sum(cnt) AS BIGINT) AS c
      FROM (SELECT cnt, unnest(ps) AS p FROM finr$r) GROUP BY p),
    seed$r AS (
      SELECT s.p, coalesce(u.c,
          CASE WHEN len(s.p) = 1 THEN CAST(1 AS BIGINT) END) AS c
      FROM $prev s LEFT JOIN used$r u ON u.p = s.p
      WHERE u.c IS NOT NULL OR len(s.p) = 1)"""
    }.mkString(",")
    s"""
    uw0 AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text,' ')) AS w FROM $fromTable)
      GROUP BY w),
    uwr AS (SELECT w, cnt,
        row_number() OVER (ORDER BY cnt DESC, w) <= $uniTopK AS tr
      FROM uw0),
    hw AS MATERIALIZED (SELECT w, cnt FROM uwr WHERE tr),
    uchars AS (SELECT DISTINCT unnest(regexp_extract_all(w, '.')) AS p
      FROM uwr),
    usubs AS (SELECT p, CAST(sum(cnt) AS BIGINT) AS c FROM (
        SELECT cnt, unnest(flatten(list_transform(
            range(1, ${uniMaxLen + 1}),
            l -> list_transform(range(greatest(len(w) - l + 1, 0)),
              i -> substring(w, CAST(i + 1 AS INTEGER),
                CAST(l AS INTEGER)))))) AS p
        FROM hw) GROUP BY p),
    seed0 AS (
      SELECT ch.p, greatest(coalesce(s.c, 0), 1) AS c
      FROM uchars ch LEFT JOIN usubs s ON s.p = ch.p
      UNION ALL
      SELECT p, c FROM (
        SELECT p, c, row_number() OVER (ORDER BY c DESC, p) AS rk
        FROM usubs WHERE len(p) > 1) WHERE rk <= $uniMulti),
    $roundCtes,
    ucost AS MATERIALIZED (SELECT p,
        CAST(round(ln(CAST((SELECT sum(c) FROM seed$uniRounds) AS DOUBLE)
          / c) * 1000000) AS BIGINT) AS cost
      FROM seed$uniRounds),
    uvocab AS MATERIALIZED (SELECT p AS piece,
        CAST(row_number() OVER (ORDER BY p) AS BIGINT) AS id
      FROM seed$uniRounds),
    aw AS MATERIALIZED (${
      if (encTable == null) "SELECT w, CAST(0 AS BIGINT) AS cnt FROM uw0"
      else s"""SELECT w, CAST(0 AS BIGINT) AS cnt FROM (
        SELECT DISTINCT unnest(string_split(text,' ')) AS w
        FROM $encSrc)"""}),
    ${uniViterbiCte("f", "aw", "ucost", byteFallback)},
    uwex AS (SELECT w,
        unnest(list_transform(ps, (s, i) -> {'i': i, 's': s})) AS u
      FROM finf),
    ${
      if (byteFallback) s"""
    uvn AS (SELECT CAST(count(*) AS BIGINT) AS vn FROM uvocab),
    uwj AS (SELECT w, u.i AS i,
        CASE WHEN v.id IS NOT NULL THEN [v.id]
             ELSE list_transform(range(octet_length(encode(u.s))),
               b -> vn + 1 +
                 ('0x'||substr(hex(encode(u.s)),
                   CAST(b*2+1 AS INTEGER), 2))::BIGINT)
        END AS ids
      FROM uwex LEFT JOIN uvocab v ON v.piece = u.s CROSS JOIN uvn),
    uwid0 AS (SELECT w,
        flatten(list_transform(list_sort(list({'i': i, 'ids': ids})),
          x -> x.ids)) AS ids
      FROM uwj GROUP BY w)"""
      else """
    uwj AS (SELECT w, u.i AS i, v.id AS id
      FROM uwex JOIN uvocab v ON v.piece = u.s),
    uwid0 AS (SELECT w,
        list_transform(list_sort(list({'i': i, 'id': id})),
          x -> x.id) AS ids
      FROM uwj GROUP BY w)"""},
    uwid AS (SELECT w, ids FROM uwid0
      UNION ALL SELECT w, CAST([] AS BIGINT[]) FROM finf
      WHERE len(ps) = 0),
    udt AS (SELECT doc_id,
        unnest(list_transform(string_split(text, ' '),
          (w, i) -> {'i': i, 'w': w})) AS u
      FROM $encSrc),
    udj AS (SELECT doc_id, u.i AS i, uwid.ids AS ids
      FROM udt JOIN uwid ON uwid.w = u.w),
    uda AS (SELECT doc_id,
        flatten(list_transform(
          list_sort(list({'i': i, 'ids': ids})),
          (x, j) -> CASE WHEN j = 1 THEN x.ids
            ELSE [CAST(0 AS BIGINT)] || x.ids END)) AS enc
      FROM udj GROUP BY doc_id)"""
  }

  private lazy val uniCtes =
    "WITH RECURSIVE\n" + uniCtesBody("documents")

  private val dotSql =
    "list_sum(list_transform(range(len(%s)), i -> CAST(%s[i+1] AS DOUBLE)*CAST(%s[i+1] AS DOUBLE)))"

  /** The x138 hourly-rate anomaly z-test SQL — also x145's oracle and
    * x153's compacted-ledger oracle: batch, streaming-ledger, and
    * compacted-streaming-ledger must all equal it. */
  private val cdcLedgerOracleSql =
    """WITH t AS (SELECT doc_id, text,
            CAST(length(text) AS BIGINT) AS len FROM documents
            WHERE text IS NOT NULL AND length(text) >= 1),
        b AS (SELECT doc_id, text, len,
            CASE WHEN len >= 16 THEN
              list_filter(range(16, len + 1), i ->
                list_sum(list_transform(range(16), j ->
                  ascii(substring(text, CAST(i - 15 + j AS INTEGER), 1))
                    * ([122335, 748097, 903583, 198273, 107871, 307905, 618783, 290561, 77023, 408385, 317599, 923521, 29791, 961, 31, 1])[j + 1])) % 64 = 0)
            ELSE [] END AS bnds FROM t),
        sp AS (SELECT doc_id, text, len, bnds,
            unnest(range(1, CAST(len(bnds) + 2 AS BIGINT))) AS k FROM b),
        ch AS (SELECT doc_id,
            CASE WHEN k = 1 THEN 1 ELSE bnds[CAST(k - 1 AS INTEGER)] + 1
              END AS s,
            CASE WHEN k <= len(bnds) THEN bnds[CAST(k AS INTEGER)]
              ELSE len END AS e,
            text FROM sp),
        chk AS (SELECT doc_id, md5(substring(text, CAST(s AS INTEGER),
            CAST(e - s + 1 AS INTEGER))) AS h, e - s + 1 AS clen
          FROM ch WHERE e >= s),
        q AS (SELECT DISTINCT doc_id, h FROM chk WHERE clen >= 32),
        spl AS (SELECT (min(doc_id) + max(doc_id)) // 2 AS sp
          FROM documents),
        b1 AS (SELECT doc_id, h FROM q CROSS JOIN spl
          WHERE doc_id <= spl.sp),
        m1 AS (SELECT h, min(doc_id) AS mind FROM b1 GROUP BY h),
        bad1 AS (SELECT DISTINCT b1.doc_id FROM b1 JOIN m1 USING (h)
          WHERE b1.doc_id > m1.mind),
        keptch AS (SELECT DISTINCT h FROM b1
          WHERE doc_id NOT IN (SELECT doc_id FROM bad1)),
        b2 AS (SELECT doc_id, h FROM q CROSS JOIN spl
          WHERE doc_id > spl.sp),
        m2 AS (SELECT h, min(doc_id) AS mind FROM b2 GROUP BY h),
        bad2 AS (SELECT DISTINCT b2.doc_id FROM b2 JOIN m2 USING (h)
          WHERE b2.h IN (SELECT h FROM keptch) OR b2.doc_id > m2.mind)
        SELECT d.doc_id,
          (d.doc_id NOT IN (SELECT doc_id FROM bad1)
           AND d.doc_id NOT IN (SELECT doc_id FROM bad2)) AS kept,
          CAST(CASE WHEN d.doc_id <= spl.sp THEN 1 ELSE 2 END AS BIGINT)
            AS batch
        FROM documents d CROSS JOIN spl ORDER BY d.doc_id"""

  private val profileDriftSql =
    """WITH spl AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts)))
              // 2 AS sp FROM events),
        e AS (SELECT event_type, user_id,
            CAST(round(value * 100) AS BIGINT) AS value_cents,
            CASE WHEN epoch_us(ts) <= spl.sp THEN 'a' ELSE 'b' END AS sl
          FROM events CROSS JOIN spl),
        s AS (SELECT sl, 'event_type' AS column_name,
            event_type AS value FROM e
          UNION ALL SELECT sl, 'user_id', CAST(user_id AS VARCHAR) FROM e
          UNION ALL SELECT sl, 'value_cents',
            CAST(value_cents AS VARCHAR) FROM e),
        g AS (SELECT sl, column_name, value, CAST(count(*) AS BIGINT) AS c
          FROM s GROUP BY 1, 2, 3),
        r AS (SELECT sl, column_name, CAST(sum(c) AS BIGINT) AS n_rows,
            CAST(coalesce(sum(c) FILTER (WHERE value IS NULL), 0)
              AS BIGINT) AS n_null,
            CAST(count(*) FILTER (WHERE value IS NOT NULL) AS BIGINT)
              AS n_distinct,
            CAST(CASE WHEN count(*) FILTER (WHERE value IS NOT NULL) > 0
              THEN sum(c * length(value)) * 1000000 //
                (sum(c) - coalesce(sum(c) FILTER (WHERE value IS NULL), 0))
              ELSE 0 END AS BIGINT) AS avg_len_micro
          FROM g GROUP BY 1, 2),
        mx AS (SELECT sl, column_name, max(c) AS maxc FROM g
          WHERE value IS NOT NULL GROUP BY 1, 2),
        md AS (SELECT g.sl, g.column_name, min(g.value) AS mode_value,
            CAST(max(g.c) AS BIGINT) AS mode_count
          FROM g JOIN mx ON g.sl = mx.sl AND g.column_name = mx.column_name
            AND g.c = mx.maxc
          WHERE g.value IS NOT NULL GROUP BY 1, 2),
        p AS (SELECT r.sl, r.column_name, r.n_rows, r.n_null,
            r.n_distinct, r.avg_len_micro, md.mode_value,
            coalesce(md.mode_count, 0) AS mode_count
          FROM r LEFT JOIN md ON r.sl = md.sl
            AND r.column_name = md.column_name),
        pa AS (SELECT * FROM p WHERE sl = 'a'),
        pb AS (SELECT * FROM p WHERE sl = 'b'),
        d AS (SELECT pa.column_name,
            pa.n_rows AS n_rows_a, pb.n_rows AS n_rows_b,
            CAST(pa.n_null * 1000000 // pa.n_rows AS BIGINT)
              AS null_rate_a_micro,
            CAST(pb.n_null * 1000000 // pb.n_rows AS BIGINT)
              AS null_rate_b_micro,
            pa.n_distinct AS distinct_a, pb.n_distinct AS distinct_b,
            CAST(abs(pa.n_distinct - pb.n_distinct) * 1000000 //
              greatest(pa.n_distinct, pb.n_distinct, 1) AS BIGINT)
              AS distinct_drift_micro,
            CAST(abs(pa.avg_len_micro - pb.avg_len_micro) AS BIGINT)
              AS len_drift_micro,
            pa.mode_value AS mode_a, pb.mode_value AS mode_b,
            (pa.mode_value IS DISTINCT FROM pb.mode_value) AS mode_changed,
            ((pa.mode_value IS DISTINCT FROM pb.mode_value)
             AND pa.mode_count * 2 >= pa.n_rows - pa.n_null
             AND pa.n_rows - pa.n_null > 0
             AND pb.mode_count * 2 >= pb.n_rows - pb.n_null
             AND pb.n_rows - pb.n_null > 0) AS mode_drift
          FROM pa JOIN pb USING (column_name))
        SELECT column_name, n_rows_a, n_rows_b, null_rate_a_micro,
          null_rate_b_micro,
          CAST(abs(null_rate_a_micro - null_rate_b_micro) AS BIGINT)
            AS null_drift_micro,
          distinct_a, distinct_b, distinct_drift_micro, len_drift_micro,
          mode_a, mode_b, mode_changed,
          (abs(null_rate_a_micro - null_rate_b_micro) > 10000
           OR distinct_drift_micro > 200000
           OR len_drift_micro > 100000 OR mode_drift) AS drifted
        FROM d ORDER BY column_name"""

  private val hourlyAnomalySql =
    """WITH h AS (SELECT date_trunc('hour', ts) AS hour,
               count(*) AS n_events,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 AS n_matched
               FROM events GROUP BY 1),
        h2 AS (SELECT hour, CAST(n_events AS BIGINT) AS n_events,
               CAST(n_matched AS BIGINT) AS n_matched,
               CAST(n_matched * 1000000 // n_events AS BIGINT)
                 AS share_micro,
               epoch(hour) AS ep FROM h),
        o AS (SELECT ep, ep - k * 3600 AS b_ep
              FROM h2 CROSS JOIN unnest(range(1, 25)) AS t(k)),
        b AS (SELECT o.ep, CAST(count(*) AS BIGINT) AS baseline_hours,
              CAST(sum(x.share_micro) AS BIGINT) AS s1,
              CAST(sum(x.share_micro * x.share_micro) AS BIGINT) AS s2
              FROM o JOIN h2 x ON o.b_ep = x.ep GROUP BY o.ep)
        SELECT CAST(h2.hour AS VARCHAR) AS hour, h2.n_events,
          h2.n_matched, h2.share_micro,
          coalesce(b.baseline_hours, 0) AS baseline_hours,
          CAST(CASE WHEN coalesce(b.baseline_hours, 0) > 0
               THEN b.s1 // b.baseline_hours ELSE 0 END AS BIGINT)
            AS baseline_mean_micro,
          (coalesce(b.baseline_hours, 0) >= 12
           AND b.baseline_hours * h2.share_micro > b.s1
           AND (b.baseline_hours * h2.share_micro - b.s1) *
               (b.baseline_hours * h2.share_micro - b.s1) >
               9 * (b.baseline_hours * b.s2 - b.s1 * b.s1)) AS flag
        FROM h2 LEFT JOIN b ON h2.ep = b.ep
        ORDER BY hour"""

  /** Per-document bigram-LM score (x40's oracle, sans ORDER BY) — also
    * the `scored` input of the x45 bucket oracle. */
  private val lmNllSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
      tok AS (SELECT unnest(ts) AS w FROM t),
      uni AS (SELECT w, count(*) AS c1 FROM tok GROUP BY w),
      v AS (SELECT count(*) AS vsz FROM uni),
      bg AS (SELECT doc_id, ts[i+1] AS w1, ts[i+2] AS w2
             FROM (SELECT doc_id, ts, unnest(range(len(ts)-1)) AS i FROM t)),
      bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      sc AS (SELECT doc_id,
             CAST(round(ln((bi.c2 + 1.0) / (uni.c1 + v.vsz)), 6) AS DECIMAL(18,6)) AS lp
             FROM bg JOIN bi USING (w1, w2) JOIN uni ON bg.w1 = uni.w CROSS JOIN v)
      SELECT doc_id, count(*) AS n_bigrams,
        floor((-(CAST(sum(lp) AS DOUBLE) / count(*))) * 10000 + 0.5)
          / 10000 AS avg_nll
      FROM sc GROUP BY doc_id"""

  /** The x51 scorer chain (x28-rule weak labels → [[graft.operators.NbQuality]]),
    * shared with its x107 calibration report. */
  private def nbScored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val toks = col("toks")
    val labeled = t(s, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"), col("text"),
        (nTokens(toks) >= 30 && dupTokenRatio(toks) <= 0.55 &&
          avgTokenLen(toks) >= 4.0 && avgTokenLen(toks) <= 5.0 &&
          stopwordRatio(toks) > 0.0).cast("long").as("label"))
    graft.operators.NbQuality
      .naiveBayesScore(labeled, "doc_id", "text", "label")
  }

  /** x51's oracle body (no ORDER BY) — also the `sc` input of the x107
    * calibration oracle. */
  private val nbScoreSql =
    """WITH d AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        lab AS (SELECT doc_id, ts,
          CAST(len(ts) >= 30
           AND 1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts) <= 0.55
           AND CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)/len(ts) BETWEEN 4.0 AND 5.0
           AND len(list_filter(ts, t -> t IN ('the','a','of','and','to','in','is'))) > 0
          AS BIGINT) AS label FROM d),
        tok AS (SELECT doc_id, label, unnest(ts) AS w FROM lab),
        tot AS (SELECT
          sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS nt1,
          sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nt0,
          count(DISTINCT CASE WHEN label = 1 THEN doc_id END) AS nd1,
          count(DISTINCT CASE WHEN label = 0 THEN doc_id END) AS nd0,
          count(DISTINCT w) AS vsz FROM tok),
        wc AS (SELECT w,
          sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1,
          sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0
          FROM tok GROUP BY w),
        lp AS (SELECT w,
          CAST(round(ln((c1 + 1.0) / (nt1 + vsz)), 6) AS DECIMAL(18,6)) AS lp1,
          CAST(round(ln((c0 + 1.0) / (nt0 + vsz)), 6) AS DECIMAL(18,6)) AS lp0
          FROM wc CROSS JOIN tot),
        pri AS (SELECT
          CAST(round(ln((nd1 + 1.0) / (nd1 + nd0 + 2.0)), 6) AS DECIMAL(18,6)) AS lpr1,
          CAST(round(ln((nd0 + 1.0) / (nd1 + nd0 + 2.0)), 6) AS DECIMAL(18,6)) AS lpr0
          FROM tot),
        sc AS (SELECT doc_id, label, count(*) AS n_tokens,
          sum(lp1) AS s1, sum(lp0) AS s0
          FROM tok JOIN lp USING (w) GROUP BY doc_id, label)
        SELECT doc_id, label, n_tokens,
          CAST(round((s1 + lpr1) - (s0 + lpr0), 4) AS DOUBLE) AS llr,
          (s1 + lpr1) - (s0 + lpr0) > 0 AS pred
        FROM sc, pri"""

  /** Shared CTE body for the [[Dedup.embeddingLshPairs]] oracles:
    * `e` (vectors + md5-seeded ±1 projection bits), `bands`, `cand`
    * (blocked candidate pairs), `pr` (exact-cosine-verified pairs above
    * `threshold`). Compose after a `WITH`/`WITH RECURSIVE`. */
  private def srpCtes(numPlanes: Int, numBands: Int, threshold: Double,
      table: String): String = {
    val rows = numPlanes / numBands
    def bitSql(p: Int) =
      s"""CASE WHEN round(list_sum(list_transform(range(len(embedding)),
         i -> CAST(embedding[i+1] AS DOUBLE) *
           (CASE WHEN substr(md5('${p}_'||CAST(i AS VARCHAR)),1,1) >= '8'
            THEN 1.0 ELSE -1.0 END))), 4) >= 0 THEN '1' ELSE '0' END"""
    val bits = (0 until numPlanes).map(p => s"${bitSql(p)} AS b$p").mkString(", ")
    val bands = (0 until numBands).map(b =>
      s"SELECT vec_id, $b AS band, " +
        (0 until rows).map(r => s"b${b * rows + r}").mkString("||") +
        " AS key FROM e").mkString(" UNION ALL ")
    val d = dotSql.format("ea.embedding", "ea.embedding", "eb.embedding")
    val n = dotSql.format("embedding", "embedding", "embedding")
    s"""e AS (SELECT vec_id, embedding, sqrt($n) AS nrm, $bits FROM $table),
      bands AS ($bands),
      cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
      pr AS (SELECT id_a, id_b, round($d / (ea.nrm * eb.nrm), 4) AS cos
             FROM cand JOIN e ea ON id_a = ea.vec_id JOIN e eb ON id_b = eb.vec_id
             WHERE round($d / (ea.nrm * eb.nrm), 4) >= $threshold)"""
  }

  /** [[srpCtes]] at the CORPUS-SCALED key width
    * ([[Dedup.embeddingLshPairsScaled]]): regenerates the
    * maxBits-stride hyperplanes, derives `bits` from count(*) with the
    * SAME integer comparisons as [[Dedup.adaptiveBandBits]] (a CASE
    * chain over n ≤ targetBucket·2^b — no float log2), and truncates
    * each band's full-width key with substr(key, 1, bits) — the prefix
    * property the stride layout guarantees. */
  private def srpScaledCtes(numBands: Int, threshold: Double,
      table: String, targetBucket: Int = 8, minBits: Int = 8,
      maxBits: Int = 24): String = {
    def bitSql(p: Int) =
      s"""CASE WHEN round(list_sum(list_transform(range(len(embedding)),
         i -> CAST(embedding[i+1] AS DOUBLE) *
           (CASE WHEN substr(md5('${p}_'||CAST(i AS VARCHAR)),1,1) >= '8'
            THEN 1.0 ELSE -1.0 END))), 4) >= 0 THEN '1' ELSE '0' END"""
    val bits = (0 until numBands * maxBits)
      .map(p => s"${bitSql(p)} AS b$p").mkString(", ")
    val caseChain = (minBits until maxBits).map(b =>
      s"WHEN (SELECT n FROM srpn) <= ${targetBucket.toLong << b} " +
        s"THEN $b").mkString(" ")
    val bands = (0 until numBands).map(b =>
      s"SELECT vec_id, $b AS band, substr(" +
        (0 until maxBits).map(r => s"b${b * maxBits + r}").mkString("||") +
        ", 1, (SELECT bits FROM srpb)) AS key FROM e")
      .mkString(" UNION ALL ")
    val d = dotSql.format("ea.embedding", "ea.embedding", "eb.embedding")
    val n = dotSql.format("embedding", "embedding", "embedding")
    s"""srpn AS (SELECT count(*) AS n FROM $table),
      srpb AS (SELECT CASE $caseChain ELSE $maxBits END AS bits FROM srpn),
      e AS (SELECT vec_id, embedding, sqrt($n) AS nrm, $bits FROM $table),
      bands AS ($bands),
      cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
      pr AS (SELECT id_a, id_b, round($d / (ea.nrm * eb.nrm), 4) AS cos
             FROM cand JOIN e ea ON id_a = ea.vec_id JOIN e eb ON id_b = eb.vec_id
             WHERE round($d / (ea.nrm * eb.nrm), 4) >= $threshold)"""
  }

  /** DuckDB oracle for [[Dedup.embeddingLshPairs]] at any (planes, bands,
    * threshold) over any table expression: regenerates the identical
    * md5-seeded ±1 hyperplanes, band keys, and rounded-cosine verify. */
  private def srpOracleSql(numPlanes: Int, numBands: Int, threshold: Double,
      table: String): String =
    s"""WITH ${srpCtes(numPlanes, numBands, threshold, table)}
      SELECT id_a, id_b, cos FROM pr ORDER BY id_a, id_b"""

  /** DuckDB oracle for x92's [[Dedup.semanticDecontaminate]] run:
    * regenerates the twin fixture, the identical SRP hyperplanes/band
    * keys for BOTH sides, the bipartite corpus×bench candidate join,
    * the 4dp-cosine verify, and the anti-join of surviving corpus ids. */
  private def srpDecontOracleSql(numPlanes: Int, numBands: Int,
      threshold: Double): String = {
    val rows = numPlanes / numBands
    def bitSql(p: Int) =
      s"""CASE WHEN round(list_sum(list_transform(range(len(embedding)),
         i -> CAST(embedding[i+1] AS DOUBLE) *
           (CASE WHEN substr(md5('${p}_'||CAST(i AS VARCHAR)),1,1) >= '8'
            THEN 1.0 ELSE -1.0 END))), 4) >= 0 THEN '1' ELSE '0' END"""
    val bits = (0 until numPlanes).map(p => s"${bitSql(p)} AS b$p")
      .mkString(", ")
    val bands = (0 until numBands).map(b =>
      s"SELECT vec_id, is_bench, $b AS band, " +
        (0 until rows).map(r => s"b${b * rows + r}").mkString("||") +
        " AS key FROM e").mkString(" UNION ALL ")
    val d = dotSql.format("ec.embedding", "ec.embedding", "eb.embedding")
    val n = dotSql.format("embedding", "embedding", "embedding")
    s"""WITH allv AS (
        SELECT vec_id, embedding, FALSE AS is_bench FROM embeddings
        WHERE vec_id % 10 <> 0
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
          list_transform(range(len(embedding)),
            i -> CASE WHEN i % 16 = 0 THEN CAST(0.0 AS FLOAT)
                 ELSE embedding[i+1] END) AS embedding,
          FALSE AS is_bench
        FROM embeddings WHERE vec_id % 20 = 0
        UNION ALL
        SELECT vec_id, embedding, TRUE AS is_bench FROM embeddings
        WHERE vec_id % 10 = 0),
      e AS (SELECT vec_id, is_bench, embedding, sqrt($n) AS nrm, $bits
        FROM allv),
      bands AS ($bands),
      cand AS (SELECT DISTINCT a.vec_id AS cid, b.vec_id AS bid
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
        WHERE NOT a.is_bench AND b.is_bench),
      bad AS (SELECT DISTINCT cid FROM cand
        JOIN e ec ON cand.cid = ec.vec_id
        JOIN e eb ON cand.bid = eb.vec_id
        WHERE round($d / (ec.nrm * eb.nrm), 4) >= $threshold)
    SELECT vec_id FROM allv
    WHERE NOT is_bench AND vec_id NOT IN (SELECT cid FROM bad)
    ORDER BY vec_id"""
  }

  val all: Seq[Q] = Seq(

    // ---- sorted-neighborhood blocking (merge/purge): candidate pairs
    //      within a sliding window of the GLOBAL balance-sort order —
    //      the linkage blocking that survives a corrupted block key;
    //      global positions come from the order-preserving prefix-
    //      bucket decomposition (no global window), so the plan is
    //      lint-clean while the oracle is the single global sort the
    //      operator must equal -----------------------------------------
    Q("x176_sorted_neighborhood",
      (s, dir) => {
        val cents = round(col("c_acctbal") * 100).cast("long")
        val cust = t(s, dir, "customer").select(
          col("c_custkey").cast("long").as("id"),
          lpad((cents + 100000L).cast("string"), 8, "0").as("k"))
        graft.operators.SortedNeighborhood.candidatePairs(
            cust, "id", "k", window = 4,
            bucketChars = 4, superChars = 2, segSize = 4096L)
          .select(col("id_a"), col("id_b"), col("dist"),
            (col("key_b").cast("long") - col("key_a").cast("long"))
              .as("cents_gap"))
          .withColumn("near_tie", col("cents_gap") <= 10L)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH b AS (SELECT c_custkey AS id,
            lpad(CAST(CAST(round(c_acctbal * 100) AS BIGINT) + 100000
              AS VARCHAR), 8, '0') AS k
          FROM customer),
        p AS (SELECT id, k,
            row_number() OVER (ORDER BY k, id) AS pos FROM b)
        SELECT a.id AS id_a, b.id AS id_b,
          CAST(b.pos - a.pos AS BIGINT) AS dist,
          CAST(b.k AS BIGINT) - CAST(a.k AS BIGINT) AS cents_gap,
          CAST(b.k AS BIGINT) - CAST(a.k AS BIGINT) <= 10 AS near_tie
        FROM p a JOIN p b ON b.pos - a.pos BETWEEN 1 AND 3
        ORDER BY id_a, id_b""")),

    // ---- chi-square independence audit: is priority confounded with
    //      status? is either drifting by year? — Σ O²N/(ra·cb) − N over
    //      OBSERVED cells only (the zero-cell-free identity), margins
    //      re-aggregated from the classes-sized cell table, per-cell
    //      contributions decimal-rounded before the order-free sum ------
    Q("x177_chi2_independence",
      (s, dir) => {
        val d = t(s, dir, "orders").select(
          col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"),
          year(col("o_orderdate")).cast("string").as("yr"))
        graft.operators.ChiSquare.audit(d,
            Seq(("st", "pr"), ("st", "yr"), ("pr", "yr")), vFlag = 0.1)
          .orderBy(col("pair"))
      },
      Some("""WITH d AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
            CAST(year(o_orderdate) AS VARCHAR) AS yr FROM orders),
        s AS (SELECT 'st~pr' AS pair, st AS va, pr AS vb FROM d
          UNION ALL SELECT 'st~yr', st, yr FROM d
          UNION ALL SELECT 'pr~yr', pr, yr FROM d),
        cells AS (SELECT pair, va, vb, CAST(count(*) AS BIGINT) AS o
          FROM s GROUP BY 1, 2, 3),
        rm AS (SELECT pair, va, CAST(sum(o) AS BIGINT) AS ra
          FROM cells GROUP BY 1, 2),
        cm AS (SELECT pair, vb, CAST(sum(o) AS BIGINT) AS cb
          FROM cells GROUP BY 1, 2),
        tt AS (SELECT pair, CAST(sum(o) AS BIGINT) AS n
          FROM cells GROUP BY 1),
        dims AS (SELECT rr.pair, rr.r, cc.c FROM
          (SELECT pair, CAST(count(*) AS BIGINT) AS r FROM rm GROUP BY 1) rr
          JOIN (SELECT pair, CAST(count(*) AS BIGINT) AS c FROM cm
            GROUP BY 1) cc USING (pair)),
        ctr AS (SELECT cells.pair,
            CAST(round(CAST(o AS DOUBLE) * o * n /
              (CAST(ra AS DOUBLE) * cb), 8) AS DECIMAL(18,8)) AS t, n
          FROM cells JOIN rm USING (pair, va) JOIN cm USING (pair, vb)
            JOIN tt USING (pair)),
        byp AS (SELECT pair, sum(t) AS sdec, CAST(min(n) AS BIGINT) AS n
          FROM ctr GROUP BY 1),
        fin AS (SELECT b.pair, b.n, b.sdec, d.r, d.c,
            (d.r - 1) * (d.c - 1) AS dof,
            greatest(CAST(b.sdec - b.n AS DOUBLE), 0.0) AS chi2raw,
            least(d.r, d.c) - 1 AS minrc
          FROM byp b JOIN dims d USING (pair))
        SELECT pair, n, r, c, dof,
          CAST(greatest(round(sdec - n, 6), 0) AS DOUBLE) AS chi2,
          CASE WHEN minrc > 0
            THEN round(sqrt(chi2raw / (n * minrc)), 6)
            ELSE 0.0 END AS cramers_v,
          (CASE WHEN minrc > 0
            THEN round(sqrt(chi2raw / (n * minrc)), 6)
            ELSE 0.0 END) >= 0.1 AS dependent
        FROM fin ORDER BY pair""")),

    // ---- z-order layout audit: Morton-key lineitem on (quantity,
    //      price), bucket by the key's top 8 bits (= the files a
    //      z-sorted writer would cut) and report each bucket's
    //      per-dim bounding box — every bucket must be a tight aligned
    //      box on BOTH dims at once, the property that makes range
    //      predicates on either dim prune most files ------------------
    Q("x178_zorder_layout",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        val mm = li.agg(min(col("qty")).as("qmin"), max(col("qty")).as("qmax"),
          min(col("cents")).as("cmin"), max(col("cents")).as("cmax"))
        val normed = li.crossJoin(broadcast(mm)).select(
          expr("CASE WHEN qmax = qmin THEN 0L ELSE " +
            "(qty - qmin) * 255L DIV (qmax - qmin) END").as("qn"),
          expr("CASE WHEN cmax = cmin THEN 0L ELSE " +
            "(cents - cmin) * 255L DIV (cmax - cmin) END").as("pn"))
        graft.operators.ZOrder.localityReport(
            normed, Seq("qn", "pn"), bits = 8, shift = 8)
          .withColumn("q_tight", col("qn_max") - col("qn_min") <= 15L)
          .withColumn("p_tight", col("pn_max") - col("pn_min") <= 15L)
          .orderBy(col("bucket"))
      },
      Some(s"""WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
          FROM lineitem),
        mm AS (SELECT min(qty) AS qmin, max(qty) AS qmax,
            min(cents) AS cmin, max(cents) AS cmax FROM li),
        nm AS (SELECT
            CASE WHEN qmax = qmin THEN 0
              ELSE (qty - qmin) * 255 // (qmax - qmin) END AS qn,
            CASE WHEN cmax = cmin THEN 0
              ELSE (cents - cmin) * 255 // (cmax - cmin) END AS pn
          FROM li CROSS JOIN mm),
        z AS (SELECT qn, pn, ${mortonSql("qn", "pn", 8)} AS zkey FROM nm)
        SELECT zkey // 256 AS bucket, CAST(count(*) AS BIGINT) AS n,
          min(qn) AS qn_min, max(qn) AS qn_max,
          min(pn) AS pn_min, max(pn) AS pn_max,
          max(qn) - min(qn) <= 15 AS q_tight,
          max(pn) - min(pn) <= 15 AS p_tight
        FROM z GROUP BY 1 ORDER BY bucket""")),

    // ---- activity streaks (gaps-and-islands): day − row_number is
    //      constant across consecutive runs, so streaks reduce to one
    //      GROUP BY — per-user longest run / streak counts without a
    //      self-join; all windows user-partitioned over calendar-
    //      bounded day frames ------------------------------------------
    Q("x179_activity_streaks",
      (s, dir) => graft.operators.Streaks.daily(
        t(s, dir, "events"), "user_id", "ts")
        .orderBy(col("user_id")),
      Some("""WITH days AS (SELECT DISTINCT user_id AS u,
            CAST(ts AS DATE) AS d
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        isl AS (SELECT u, d,
            (d - DATE '1970-01-01')
              - row_number() OVER (PARTITION BY u ORDER BY d) AS island
          FROM days),
        st AS (SELECT u, island, CAST(count(*) AS BIGINT) AS len,
            min(d) AS start FROM isl GROUP BY 1, 2),
        wm AS (SELECT u, len, start,
            max(len) OVER (PARTITION BY u) AS maxlen FROM st)
        SELECT u AS user_id, CAST(sum(len) AS BIGINT) AS active_days,
          CAST(count(*) AS BIGINT) AS n_streaks,
          CAST(min(maxlen) AS BIGINT) AS max_streak,
          strftime(min(CASE WHEN len = maxlen THEN start END),
            '%Y-%m-%d') AS max_streak_start
        FROM wm GROUP BY u ORDER BY user_id""")),

    // ---- last-touch attribution: each purchase credits the most
    //      recent prior click/view by the same user within a 1-day
    //      lookback — ONE user-partitioned running-last window (no
    //      touch×conversion range join), same-ts touches sort before
    //      conversions, -1 sentinels keep the report null-free --------
    Q("x180_last_touch_attribution",
      (s, dir) => graft.operators.Attribution.lastTouch(
        t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
        conversionType = "purchase", touchTypes = Seq("click", "view"),
        lookbackSeconds = 86400L)
        .orderBy(col("conv_id")),
      Some("""WITH base AS (SELECT user_id AS u, ts, event_id AS id,
            event_type AS ty,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isconv
          FROM events
          WHERE event_type IN ('purchase', 'click', 'view')),
        sc AS (SELECT *,
            last_value(CASE WHEN isconv = 0 THEN epoch_us(ts) END
              IGNORE NULLS) OVER w AS lt_us,
            last_value(CASE WHEN isconv = 0 THEN ty END IGNORE NULLS)
              OVER w AS lt_ty,
            last_value(CASE WHEN isconv = 0 THEN id END IGNORE NULLS)
              OVER w AS lt_id
          FROM base
          WINDOW w AS (PARTITION BY u ORDER BY ts, isconv, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT id AS conv_id, u AS user_id,
          strftime(ts, '%Y-%m-%d %H:%M:%S') AS conv_ts,
          CASE WHEN lt_us IS NOT NULL
              AND epoch_us(ts) - lt_us <= 86400000000
            THEN lt_ty ELSE 'none' END AS attributed,
          CAST(CASE WHEN lt_us IS NOT NULL
              AND epoch_us(ts) - lt_us <= 86400000000
            THEN lt_id ELSE -1 END AS BIGINT) AS touch_id,
          CAST(CASE WHEN lt_us IS NOT NULL
              AND epoch_us(ts) - lt_us <= 86400000000
            THEN (epoch_us(ts) - lt_us) // 1000000
            ELSE -1 END AS BIGINT) AS age_sec
        FROM sc WHERE isconv = 1 ORDER BY conv_id""")),

    // ---- approximate-FD audit (g3 error, Kivinen–Mannila): which
    //      "should-be-derivable" column pairs actually are? — one
    //      stacked pass, persisted classes-sized cell table, integer
    //      violation arithmetic; x152's uniqueness twin -----------------
    Q("x181_fd_audit",
      (s, dir) => {
        val o = t(s, dir, "orders").withColumn("yr",
          year(col("o_orderdate")).cast("string"))
        graft.operators.FdAudit.audit(o, Seq(
            (Seq("o_orderkey"), "o_orderstatus"),
            (Seq("o_custkey"), "o_orderstatus"),
            (Seq("o_custkey", "yr"), "o_orderpriority"),
            (Seq("o_orderpriority"), "o_orderstatus")))
          .orderBy(col("candidate"))
      },
      Some("""WITH o AS (SELECT *, CAST(year(o_orderdate) AS VARCHAR) AS yr
          FROM orders),
        s AS (
          SELECT 'o_orderkey->o_orderstatus' AS cand,
            coalesce(CAST(o_orderkey AS VARCHAR), '__null__') AS a,
            coalesce(o_orderstatus, '__null__') AS b FROM o
          UNION ALL
          SELECT 'o_custkey->o_orderstatus',
            coalesce(CAST(o_custkey AS VARCHAR), '__null__'),
            coalesce(o_orderstatus, '__null__') FROM o
          UNION ALL
          SELECT 'o_custkey,yr->o_orderpriority',
            concat_ws(chr(1),
              coalesce(CAST(o_custkey AS VARCHAR), '__null__'),
              coalesce(yr, '__null__')),
            coalesce(o_orderpriority, '__null__') FROM o
          UNION ALL
          SELECT 'o_orderpriority->o_orderstatus',
            coalesce(o_orderpriority, '__null__'),
            coalesce(o_orderstatus, '__null__') FROM o),
        cells AS (SELECT cand, a, b, CAST(count(*) AS BIGINT) AS o
          FROM s GROUP BY 1, 2, 3),
        pl AS (SELECT cand, a, CAST(sum(o) AS BIGINT) AS ca,
            CAST(max(o) AS BIGINT) AS mab FROM cells GROUP BY 1, 2)
        SELECT cand AS candidate, CAST(sum(ca) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_lhs_classes,
          CAST(sum(ca - mab) AS BIGINT) AS violations,
          CAST(sum(ca - mab) * 1000000 // sum(ca) AS BIGINT) AS g3_micro,
          sum(ca - mab) = 0 AS holds
        FROM pl GROUP BY cand ORDER BY candidate""")),

    // ---- streaming retraction ledger: CDC deletes as first-class
    //      input — signed per-batch partials (rows_delta, value_delta)
    //      telescope to the net position per group; negative net rows
    //      fail loudly (a retraction with no insert); oracle = the
    //      plain signed aggregation over the full table ----------------
    Q("x182_streaming_retraction_ledger",
      (s, dir) => {
        import graft.engine._
        val cdc = t(s, dir, "events").select(
          col("event_id"),
          (col("user_id") % 100).as("bucket"),
          when(col("event_type") === "error", -1L).otherwise(1L).as("op"),
          round(col("value") * 100).cast("long").as("cents"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("rtlg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/rtlg")
        s.sql("CREATE DATABASE IF NOT EXISTS rtlg")
        s.sql("DROP TABLE IF EXISTS rtlg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("rtlg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingRetractionLedger(s,
          landing.toString, cdc.schema, "rtlg.ledger", ckpt.toString,
          "bucket", "op", "cents")
        cdc.filter(col("event_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        cdc.filter(col("event_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        EventStreams.mergeRetractionLedger(s.table("rtlg.ledger"), "bucket")
          .orderBy(col("bucket"))
      },
      Some("""SELECT user_id % 100 AS bucket,
          CAST(sum(CASE WHEN event_type = 'error' THEN -1 ELSE 1 END)
            AS BIGINT) AS live_rows,
          CAST(sum((CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) *
            CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS net_value
        FROM events GROUP BY 1 ORDER BY bucket""")),

    // ---- streaming late-arrival audit: what would a 1-hour watermark
    //      have dropped? — batch 0 is the first half minus held-back
    //      stragglers (id % 37 = 0), batch 1 delivers the rest; the
    //      ledger's running high-water mark (the x50 1-row cursor)
    //      classifies batch-1 rows older than wm − delay as late -------
    Q("x183_late_arrival_audit",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("ts"))
        val firstHalf = col("ts") < lit("2024-01-16").cast("timestamp") &&
          col("event_id") % 37 =!= 0
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("latelg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/latelg")
        s.sql("CREATE DATABASE IF NOT EXISTS latelg")
        s.sql("DROP TABLE IF EXISTS latelg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("latelg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingLatenessLedger(s,
          landing.toString, ev.schema, "latelg.ledger", ckpt.toString,
          "ts", delaySeconds = 3600L)
        ev.filter(firstHalf).write.mode("overwrite").parquet(landing.toString)
        run()
        ev.filter(!firstHalf).write.mode("append").parquet(landing.toString)
        run()
        EventStreams.latenessReport(s.table("latelg.ledger"))
          .orderBy(col("batch_id"))
      },
      Some("""WITH b0 AS (SELECT * FROM events
          WHERE ts < TIMESTAMP '2024-01-16' AND event_id % 37 <> 0),
        b1 AS (SELECT * FROM events
          WHERE NOT (ts < TIMESTAMP '2024-01-16' AND event_id % 37 <> 0)),
        w0 AS (SELECT max(epoch_us(ts)) AS wm FROM b0),
        r0 AS (SELECT CAST(0 AS BIGINT) AS batch_id,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(0 AS BIGINT) AS late_rows,
            CAST(-1 AS BIGINT) AS wm_before_us FROM b0),
        r1 AS (SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN epoch_us(ts) < w0.wm - 3600000000
              THEN 1 ELSE 0 END) AS BIGINT),
            CAST(w0.wm AS BIGINT)
          FROM b1 CROSS JOIN w0 GROUP BY w0.wm),
        per AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1),
        tot AS (SELECT CAST(-1 AS BIGINT) AS batch_id,
            CAST(sum(n_rows) AS BIGINT) AS n_rows,
            CAST(sum(late_rows) AS BIGINT) AS late_rows,
            CAST(-1 AS BIGINT) AS wm_before_us FROM per)
        SELECT batch_id, n_rows, late_rows, wm_before_us,
          late_rows * 1000000 // n_rows AS late_micro
        FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
        ORDER BY batch_id""")),

    // ---- post-stratification calibration: weight a deterministic 1/8
    //      md5-sample back to the corpus's (source, lang) margins, thin
    //      cells collapsing to source pools then one global pool (each
    //      level labeled) — the mix-repair step after any non-uniform
    //      selection; everything after the two count aggs is
    //      classes-sized --------------------------------------------------
    Q("x184_post_stratification",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val smp = docs.filter(
          substring(md5(col("doc_id").cast("string")), 1, 1) < "8")
        graft.operators.PostStratify.weights(
            docs, smp, Seq("source", "lang"), minCell = 4L)
          .orderBy(col("source"), col("lang"))
      },
      Some("""WITH pop AS (SELECT source, lang,
            CAST(count(*) AS BIGINT) AS n_pop FROM documents GROUP BY 1, 2),
        smp AS (SELECT source, lang,
            CAST(count(*) AS BIGINT) AS n_sample FROM documents
          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
          GROUP BY 1, 2),
        cells AS (SELECT p.source, p.lang, p.n_pop,
            coalesce(s.n_sample, 0) AS n_sample
          FROM pop p LEFT JOIN smp s USING (source, lang)),
        fat AS (SELECT source, lang, n_pop, n_sample, 'cell' AS level,
            CAST(n_pop * 1000000 // n_sample AS BIGINT) AS weight_micro
          FROM cells WHERE n_sample >= 4),
        thin AS (SELECT * FROM cells WHERE n_sample < 4),
        pools AS (SELECT source, CAST(sum(n_pop) AS BIGINT) AS pnp,
            CAST(sum(n_sample) AS BIGINT) AS pns
          FROM thin GROUP BY 1),
        ps AS (SELECT t.source, t.lang, t.n_pop, t.n_sample,
            'pooled:source' AS level,
            CAST(p.pnp * 1000000 // p.pns AS BIGINT) AS weight_micro
          FROM thin t JOIN pools p USING (source) WHERE p.pns >= 4),
        gl AS (SELECT CAST(sum(pnp) AS BIGINT) AS gnp,
            CAST(sum(pns) AS BIGINT) AS gns
          FROM pools WHERE pns < 4),
        pg AS (SELECT t.source, t.lang, t.n_pop, t.n_sample,
            'pooled:global' AS level,
            CAST(g.gnp * 1000000 // g.gns AS BIGINT) AS weight_micro
          FROM thin t JOIN pools p USING (source) CROSS JOIN gl g
          WHERE p.pns < 4 AND g.gnp IS NOT NULL)
        SELECT * FROM fat UNION ALL SELECT * FROM ps
        UNION ALL SELECT * FROM pg
        ORDER BY source, lang""")),

    // ---- inter-arrival burstiness: Goh–Barabási B = (σ−μ)/(σ+μ) per
    //      user — metronome bots at −1, Poisson organics near 0,
    //      burst-silence scrapers > 0; one lag window + one integer-sum
    //      agg, σ/μ derived per GROUP ROW from exact sums (no double
    //      is ever summed) ---------------------------------------------
    Q("x185_interarrival_burstiness",
      (s, dir) => graft.operators.Burstiness.interArrival(
        t(s, dir, "events"), "user_id", "ts", "event_id", minGaps = 2L)
        .orderBy(col("user_id")),
      Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS ts_us,
            event_id AS id FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        g0 AS (SELECT u, (ts_us - lag(ts_us) OVER
            (PARTITION BY u ORDER BY ts_us, id)) // 1000000 AS g FROM e),
        gg AS (SELECT u, g FROM g0 WHERE g IS NOT NULL),
        a AS (SELECT u, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(g) AS BIGINT) AS s1,
            CAST(sum(CAST(g * g AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
          FROM gg GROUP BY u HAVING count(*) >= 2),
        b AS (SELECT u, n, s1,
            CAST(s1 AS DOUBLE) / n AS mu,
            sqrt(greatest(CAST(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1
              AS DOUBLE)
              / (CAST(n AS DOUBLE) * n), 0.0)) AS sig
          FROM a)
        SELECT u AS user_id, n AS n_gaps,
          CAST(s1 * 1000000 // n AS BIGINT) AS mean_gap_sec_micro,
          CASE WHEN sig + mu > 0
            THEN round((sig - mu) / (sig + mu), 6) ELSE 0.0 END
            AS burstiness,
          CASE WHEN mu > 0 THEN round(sig / mu, 6) ELSE 0.0 END AS cv
        FROM b ORDER BY user_id""")),

    // ---- dedup ROI report: the cluster-size histogram + bytes a
    //      keep-first policy saves (Lee et al. ACL'22's evidence
    //      artifact) over the x19 component chain — everything after
    //      the per-cluster agg is histogram-sized -----------------------
    Q("x186_dedup_savings",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
          maxRounds = 60)
        val labeled = docs.select(col("doc_id"), col("n_chars"))
          .join(comp, docs("doc_id") === comp("v"), "left")
          .select(coalesce(col("comp"), col("doc_id")).as("component"),
            col("doc_id"), col("n_chars"))
        Dedup.savingsReport(labeled, "component", "doc_id", "n_chars")
          .orderBy(col("cluster_size"))
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e.s, r.l FROM reach r JOIN edges e ON e.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v),
        lab AS (SELECT coalesce(c.component, d.doc_id) AS component,
            d.doc_id, d.n_chars
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
        per AS (SELECT component, CAST(count(*) AS BIGINT) AS csz,
            CAST(sum(n_chars) AS BIGINT) AS bytes,
            CAST(arg_min(n_chars, doc_id) AS BIGINT) AS keep_bytes
          FROM lab GROUP BY component),
        hist AS (SELECT csz AS cluster_size,
            CAST(count(*) AS BIGINT) AS n_clusters,
            CAST(sum(csz - 1) AS BIGINT) AS dup_docs_removed,
            CAST(sum(bytes - keep_bytes) AS BIGINT) AS bytes_saved
          FROM per GROUP BY csz),
        tot AS (SELECT CAST(-1 AS BIGINT) AS cluster_size,
            CAST(sum(n_clusters) AS BIGINT) AS n_clusters,
            CAST(sum(dup_docs_removed) AS BIGINT) AS dup_docs_removed,
            CAST(sum(bytes_saved) AS BIGINT) AS bytes_saved
          FROM hist)
        SELECT * FROM hist UNION ALL SELECT * FROM tot
        ORDER BY cluster_size""")),

    // ---- CUSUM change-point monitoring: Page's sequential statistic
    //      over daily per-type volumes via the prefix-min identity
    //      (x150's trick applied to SPC) — catches sustained small
    //      shifts no single-day z-score sees; two group-partitioned
    //      windows over calendar-bounded daily frames ------------------
    Q("x187_cusum_changepoint",
      (s, dir) => graft.operators.Cusum.dailyUpward(
        t(s, dir, "events"), "event_type", "ts", hMult = 3L)
        .orderBy(col("event_type"), col("day")),
      Some("""WITH daily AS (SELECT event_type AS grp, CAST(ts AS DATE) AS d,
            CAST(count(*) AS BIGINT) AS x
          FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
          GROUP BY 1, 2),
        m AS (SELECT grp, CAST(sum(x) // count(*) AS BIGINT) AS k
          FROM daily GROUP BY grp),
        c AS (SELECT daily.grp, d, x, k,
            CAST(sum(x - k) OVER w AS BIGINT) AS c
          FROM daily JOIN m USING (grp)
          WINDOW w AS (PARTITION BY daily.grp ORDER BY d
            ROWS UNBOUNDED PRECEDING)),
        s AS (SELECT grp, d, x, k,
            CAST(c - least(0, min(c) OVER (PARTITION BY grp ORDER BY d
              ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS cusum
          FROM c)
        SELECT grp AS event_type, strftime(d, '%Y-%m-%d') AS day, x, k,
          cusum, cusum >= 3 * greatest(k, 1) AS flagged
        FROM s ORDER BY event_type, day""")),

    // ---- exact global ranks without a global window: the TeraSort
    //      range-partition-then-offset decomposition (x176's
    //      positioning core as its own primitive — stable dense ids,
    //      deterministic pagination); oracle is the single-partition
    //      row_number() the lint forbids the plan to contain ------------
    Q("x188_global_rank",
      (s, dir) => {
        val cents = round(col("c_acctbal") * 100).cast("long")
        val cust = t(s, dir, "customer").select(
          col("c_custkey").cast("long").as("id"),
          lpad((cents + 100000L).cast("string"), 8, "0").as("k"))
        graft.operators.GlobalOrder.positions(cust, "id", "k",
            bucketChars = 4, superChars = 2)
          .orderBy(col("pos"))
      },
      Some("""WITH b AS (SELECT c_custkey AS id,
            lpad(CAST(CAST(round(c_acctbal * 100) AS BIGINT) + 100000
              AS VARCHAR), 8, '0') AS k
          FROM customer)
        SELECT id, k,
          CAST(row_number() OVER (ORDER BY k, id) AS BIGINT) AS pos
        FROM b ORDER BY pos""")),

    // ---- exact range-partitioner splitters: the 7 price keys cutting
    //      lineitem into 8 equal ranges — what repartitionByRange
    //      SAMPLES for, computed exactly from the weighted key
    //      histogram (reproducible across runs); interval test, no
    //      per-target min-agg, no global window -----------------------
    Q("x189_range_splitters",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(
          lpad(round(col("l_extendedprice") * 100).cast("long")
            .cast("string"), 10, "0").as("k"))
        graft.operators.GlobalOrder.rangeSplitters(li, "k", parts = 8,
            bucketChars = 4, superChars = 2)
          .orderBy(col("split_idx"))
      },
      Some("""WITH k AS (SELECT lpad(CAST(CAST(round(l_extendedprice * 100)
              AS BIGINT) AS VARCHAR), 10, '0') AS key FROM lineitem),
        h AS (SELECT key, CAST(count(*) AS BIGINT) AS c
          FROM k GROUP BY 1),
        cumt AS (SELECT key, c, CAST(sum(c) OVER (ORDER BY key
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h),
        n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
        tg AS (SELECT CAST(u.i AS BIGINT) AS split_idx,
            CAST(n.n * u.i // 8 AS BIGINT) AS t
          FROM n CROSS JOIN unnest([1, 2, 3, 4, 5, 6, 7]) AS u(i))
        SELECT tg.split_idx, tg.t AS target_rank, c.key AS splitter_key,
          c.cum AS cum_at
        FROM cumt c JOIN tg ON c.cum >= tg.t AND c.cum - c.c < tg.t
          AND tg.t > 0
        ORDER BY split_idx""")),

    // ---- sliding rate ceiling: each user's exact peak events-per-hour
    //      (the max over ANY trailing window, attained at event
    //      anchors) — one RANGE-frame window + per-user max on the
    //      same sort; x185's companion (B says how arrivals clump,
    //      this says how high the clump peaks) ------------------------
    Q("x190_rate_ceiling",
      (s, dir) => graft.operators.RateCeiling.slidingPeak(
        t(s, dir, "events"), "user_id", "ts", windowSeconds = 3600L)
        .orderBy(col("user_id")),
      Some("""WITH b AS (SELECT user_id AS u, ts,
            epoch_us(ts) AS us FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        c AS (SELECT u, ts,
            CAST(count(*) OVER (PARTITION BY u ORDER BY us
              RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cnt
          FROM b),
        m AS (SELECT u, ts, cnt,
            max(cnt) OVER (PARTITION BY u) AS mx FROM c)
        SELECT u AS user_id, CAST(count(*) AS BIGINT) AS n_events,
          CAST(min(mx) AS BIGINT) AS peak,
          strftime(min(CASE WHEN cnt = mx THEN ts END),
            '%Y-%m-%d %H:%M:%S') AS peak_at
        FROM m GROUP BY u ORDER BY user_id""")),

    // ---- time-to-convert distribution: exact p50/p90/p99 of the
    //      touch→purchase delay per attributed channel — x180's
    //      attribution feeding x170's count-table quantile machinery
    //      (weight = 1); the funnel-latency readout that prices the
    //      lookback window itself ---------------------------------------
    Q("x191_convert_time_quantiles",
      (s, dir) => {
        val att = graft.operators.Attribution.lastTouch(
          t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
          conversionType = "purchase", touchTypes = Seq("click", "view"),
          lookbackSeconds = 86400L)
          .filter(col("attributed") =!= "none")
          .withColumn("one", lit(1L))
        graft.operators.WeightedQuantiles.perGroup(att,
            "attributed", "age_sec", "one",
            Seq(500000L, 900000L, 990000L))
          .orderBy(col("attributed"), col("pct_micro"))
      },
      Some("""WITH base AS (SELECT user_id AS u, ts, event_id AS id,
            event_type AS ty,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isconv
          FROM events
          WHERE event_type IN ('purchase', 'click', 'view')),
        sc AS (SELECT *,
            last_value(CASE WHEN isconv = 0 THEN epoch_us(ts) END
              IGNORE NULLS) OVER w AS lt_us,
            last_value(CASE WHEN isconv = 0 THEN ty END IGNORE NULLS)
              OVER w AS lt_ty
          FROM base
          WINDOW w AS (PARTITION BY u ORDER BY ts, isconv, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        att AS (SELECT lt_ty AS g,
            CAST((epoch_us(ts) - lt_us) // 1000000 AS BIGINT) AS age
          FROM sc WHERE isconv = 1 AND lt_us IS NOT NULL
            AND epoch_us(ts) - lt_us <= 86400000000),
        h AS (SELECT g, age, CAST(count(*) AS BIGINT) AS cw
          FROM att GROUP BY 1, 2),
        c AS (SELECT g, age, cw,
            CAST(sum(cw) OVER (PARTITION BY g ORDER BY age
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h),
        t AS (SELECT g, CAST(sum(cw) AS BIGINT) AS tot
          FROM h GROUP BY 1),
        e AS (SELECT c.g, c.age, t.tot, CAST(q.p AS BIGINT) AS pct_micro
          FROM c JOIN t ON c.g = t.g
          CROSS JOIN unnest([500000, 900000, 990000]) AS q(p)
          WHERE c.cum * 1000000 >= CAST(q.p AS BIGINT) * t.tot)
        SELECT g AS attributed, pct_micro,
          CAST(min(age) AS BIGINT) AS value_at, tot AS total_weight
        FROM e GROUP BY g, pct_micro, tot
        ORDER BY attributed, pct_micro""")),

    // ---- token-mass concentration: per-source Gini over document
    //      token counts via the closed-form rank sum on the value
    //      HISTOGRAM (no per-row ranks) — a source whose mass
    //      concentrates into a few documents is a crawl artifact long
    //      before its totals drift ---------------------------------------
    Q("x192_gini_concentration",
      (s, dir) => graft.operators.Gini.perGroup(
        t(s, dir, "documents").select(col("source"),
          nTokens(tokens(col("text"))).cast("long").as("tok")),
        "source", "tok")
        .orderBy(col("source")),
      Some("""WITH d AS (SELECT source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS v
          FROM documents),
        h AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c
          FROM d GROUP BY 1, 2),
        b AS (SELECT source, v, c,
            CAST(coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS bb
          FROM h),
        w AS (SELECT source, v, c, bb,
            v * (c * bb + c * (c + 1) // 2) AS ix FROM b),
        a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
            CAST(sum(v * c) AS BIGINT) AS total,
            sum(ix) AS six, CAST(max(v) AS BIGINT) AS mx
          FROM w GROUP BY source)
        SELECT source, n, total,
          CAST(CASE WHEN total > 0 THEN mx * 1000000 // total
            ELSE 0 END AS BIGINT) AS top_share_micro,
          CASE WHEN total > 0
            THEN round(CAST(2 * six - (n + 1) * total AS DOUBLE)
              / (CAST(n AS DOUBLE) * total), 6)
            ELSE 0.0 END AS gini
        FROM a ORDER BY source""")),

    // ---- sample-ratio-mismatch check: chi-square goodness-of-fit of
    //      the md5 16-bucket assignment (the split x22/x184 stand on)
    //      against uniform weights — declared buckets join from the
    //      weight list so empty buckets still contribute; an observed
    //      bucket outside the declaration fails loudly ------------------
    Q("x193_srm_check",
      (s, dir) => graft.operators.SrmCheck.goodnessOfFit(
        t(s, dir, "documents").select(
          substring(md5(col("doc_id").cast("string")), 1, 1).as("bucket")),
        "bucket", "0123456789abcdef".map(c => (c.toString, 1L)))
        .orderBy(col("bucket")),
      Some("""WITH obs AS (SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
            AS bucket, CAST(count(*) AS BIGINT) AS o
          FROM documents GROUP BY 1),
        dec16 AS (SELECT unnest(['0','1','2','3','4','5','6','7','8','9',
            'a','b','c','d','e','f']) AS bucket, CAST(1 AS BIGINT) AS w),
        j AS (SELECT d.bucket, d.w, coalesce(o.o, 0) AS o
          FROM dec16 d LEFT JOIN obs o USING (bucket)),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM j),
        cells AS (SELECT j.bucket, j.w, j.o, t.nn,
            16 * j.o - t.nn * j.w AS num
          FROM j CROSS JOIN tot t),
        per AS (SELECT bucket, CAST(o AS BIGINT) AS n,
            CAST(w * 1000000 // 16 AS BIGINT) AS expected_micro,
            CAST(CASE WHEN nn = 0 THEN 0 ELSE o * 1000000 // nn END
              AS BIGINT) AS observed_micro,
            CAST(CASE WHEN nn = 0 THEN 0
              ELSE o * 1000000 // nn - w * 1000000 // 16 END
              AS BIGINT) AS dev_micro,
            -1.0 AS chi2 FROM cells),
        summ AS (SELECT '__chi2__' AS bucket,
            CAST(sum(o) AS BIGINT) AS n,
            CAST(1000000 AS BIGINT) AS expected_micro,
            CAST(1000000 AS BIGINT) AS observed_micro,
            CAST(0 AS BIGINT) AS dev_micro,
            CAST(round(sum(CAST(round(CAST(num * num AS DOUBLE)
              / (CAST(nn AS DOUBLE) * 16 * w), 8) AS DECIMAL(18,8))), 6)
              AS DOUBLE) AS chi2
          FROM cells)
        SELECT * FROM per UNION ALL SELECT * FROM summ
        ORDER BY bucket""")),

    // ---- capture-recapture distinct estimate: two salted half-
    //      captures of the text-hash population + the Chapman
    //      estimator — the sketch-free third way to count distincts
    //      (exact pays a full shuffle, HLL x70 pays fixed accuracy,
    //      two captures pay ~2f of the work with a stated SE); the
    //      exact column is the demo's adjudicator ---------------------
    Q("x194_capture_recapture",
      (s, dir) => graft.operators.CaptureRecapture.estimateDistinct(
        t(s, dir, "documents").select(md5(col("text")).as("k")),
        "k", hexLt = "8"),
      Some("""WITH keys AS (SELECT md5(text) AS k FROM documents
          WHERE text IS NOT NULL),
        a AS (SELECT DISTINCT k FROM keys
          WHERE substr(md5('a·' || k), 1, 1) < '8'),
        b AS (SELECT DISTINCT k FROM keys
          WHERE substr(md5('b·' || k), 1, 1) < '8'),
        na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a),
        nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b),
        nab AS (SELECT CAST(count(*) AS BIGINT) AS n_ab
          FROM a JOIN b USING (k)),
        ex AS (SELECT CAST(count(DISTINCT k) AS BIGINT)
          AS exact_distinct FROM keys)
        SELECT n_a, n_b, n_ab,
          CAST(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) // (n_ab + 1) - 1
            AS BIGINT) AS n_hat,
          round(sqrt(CAST(n_a + 1 AS DOUBLE) * CAST(n_b + 1 AS DOUBLE)
              * CAST(n_a - n_ab AS DOUBLE) * CAST(n_b - n_ab AS DOUBLE)
            / (CAST(n_ab + 1 AS DOUBLE) * CAST(n_ab + 1 AS DOUBLE)
              * CAST(n_ab + 2 AS DOUBLE))), 4)
            AS se,
          exact_distinct,
          CAST(CASE WHEN exact_distinct = 0 THEN 0
            ELSE sign(CAST(n_a + 1 AS HUGEINT) * (n_b + 1)
                // (n_ab + 1) - 1 - exact_distinct)
              * (abs(CAST(CAST(n_a + 1 AS HUGEINT) * (n_b + 1)
                    // (n_ab + 1) - 1 - exact_distinct AS HUGEINT))
                * 1000000 // exact_distinct) END
            AS BIGINT) AS err_micro
        FROM na, nb, nab, ex""")),

    // ---- exact two-sample KS drift: D = max |F_en − F_other| over
    //      the full doc-length CDFs, division-free via cross-
    //      multiplied integer cums (GlobalOrder.cumulativeSums — no
    //      global window); sees tail shifts the top-K JS buckets
    //      (x78/x84) never look at --------------------------------------
    Q("x195_ks_drift",
      (s, dir) => graft.operators.KsDrift.twoSample(
        t(s, dir, "documents").select(
          (col("lang") === "en").as("a"),
          lpad(col("n_chars").cast("string"), 6, "0").as("k")),
        col("a"), "k"),
      Some("""WITH h AS (SELECT lpad(CAST(n_chars AS VARCHAR), 6, '0') AS k,
            CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              AS ca,
            CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
              AS cb
          FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        c AS (SELECT k, ca, cb,
            CAST(sum(ca) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cua,
            CAST(sum(cb) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cub
          FROM h),
        t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
            CAST(sum(cb) AS BIGINT) AS n_b FROM h),
        s AS (SELECT c.k, abs(cua * t.n_b - cub * t.n_a) AS dev,
            t.n_a, t.n_b FROM c CROSS JOIN t),
        m AS (SELECT max(dev) AS mxd FROM s),
        sel AS (SELECT s.n_a, s.n_b, m.mxd, min(s.k) AS at_key
          FROM s CROSS JOIN m WHERE s.dev = m.mxd
          GROUP BY s.n_a, s.n_b, m.mxd)
        SELECT n_a, n_b,
          CAST(mxd * 1000000 // (n_a * n_b) AS BIGINT) AS d_micro,
          at_key,
          CAST(round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
            / (CAST(n_a AS DOUBLE) * n_b)) * 1000000, 0) AS BIGINT)
            AS crit_micro,
          CAST(mxd * 1000000 // (n_a * n_b) AS BIGINT) >
            CAST(round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
              / (CAST(n_a AS DOUBLE) * n_b)) * 1000000, 0) AS BIGINT)
            AS drifted
        FROM sel""")),

    // ---- streaming session ledger: x10's sessionization fed
    //      batch-by-batch — each batch appends only its session
    //      SUMMARIES; gap-tolerant interval merging stitches across
    //      batches (provably equal to whole-corpus sessionize for ANY
    //      split, incl. the parity interleave used here); oracle =
    //      x10's full sessionize rolled up per user -------------------
    Q("x196_streaming_session_ledger",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("sslg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/sslg")
        s.sql("CREATE DATABASE IF NOT EXISTS sslg")
        s.sql("DROP TABLE IF EXISTS sslg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("sslg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingSessionLedger(s,
          landing.toString, ev.schema, "sslg.ledger", ckpt.toString,
          "user_id", "ts", "event_id", gapMinutes = 30)
        ev.filter(col("event_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        ev.filter(col("event_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        EventStreams.mergeSessionLedger(s.table("sslg.ledger"), 30)
          .groupBy(col("u"))
          .agg(count(lit(1)).cast("long").as("n_sessions"),
            sum(col("n")).cast("long").as("n_events"),
            max(col("n")).cast("long").as("max_session_events"))
          .select(col("u").as("user_id"), col("n_sessions"),
            col("n_events"), col("max_session_events"))
          .orderBy(col("user_id"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS session_idx FROM x),
        g AS (SELECT user_id, session_idx,
            CAST(count(*) AS BIGINT) AS n
          FROM s GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
          CAST(sum(n) AS BIGINT) AS n_events,
          CAST(max(n) AS BIGINT) AS max_session_events
        FROM g GROUP BY user_id ORDER BY user_id""")),

    // ---- streaming burstiness ledger: x185 fed incrementally —
    //      per-batch (n, first, last, Σg, Σg²) partials; the merge
    //      stitches boundary gaps between batch intervals (loud guard
    //      against interleaving backfills) and must equal the batch
    //      x185 verbatim — oracle IS x185's SQL ----------------------
    Q("x197_streaming_burstiness_ledger",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("bulg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/bulg")
        s.sql("CREATE DATABASE IF NOT EXISTS bulg")
        s.sql("DROP TABLE IF EXISTS bulg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("bulg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingBurstinessLedger(s,
          landing.toString, ev.schema, "bulg.ledger", ckpt.toString,
          "user_id", "ts", "event_id")
        val firstHalf = col("ts") < lit("2024-01-16").cast("timestamp")
        ev.filter(firstHalf)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        ev.filter(!firstHalf)
          .write.mode("append").parquet(landing.toString)
        run()
        EventStreams.mergeBurstinessLedger(
            s.table("bulg.ledger"), "user_id", minGaps = 2L)
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS ts_us,
            event_id AS id FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        g0 AS (SELECT u, (ts_us - lag(ts_us) OVER
            (PARTITION BY u ORDER BY ts_us, id)) // 1000000 AS g FROM e),
        gg AS (SELECT u, g FROM g0 WHERE g IS NOT NULL),
        a AS (SELECT u, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(g) AS BIGINT) AS s1,
            CAST(sum(CAST(g * g AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
          FROM gg GROUP BY u HAVING count(*) >= 2),
        b AS (SELECT u, n, s1,
            CAST(s1 AS DOUBLE) / n AS mu,
            sqrt(greatest(CAST(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1
              AS DOUBLE)
              / (CAST(n AS DOUBLE) * n), 0.0)) AS sig
          FROM a)
        SELECT u AS user_id, n AS n_gaps,
          CAST(s1 * 1000000 // n AS BIGINT) AS mean_gap_sec_micro,
          CASE WHEN sig + mu > 0
            THEN round((sig - mu) / (sig + mu), 6) ELSE 0.0 END
            AS burstiness,
          CASE WHEN mu > 0 THEN round(sig / mu, 6) ELSE 0.0 END AS cv
        FROM b ORDER BY user_id""")),

    // ---- session-basket co-occurrence: which event types co-occur
    //      within a session more than chance — x10's gap sessions AS
    //      the baskets for x141's Apriori pair mining (support /
    //      confidence both ways / lift per type pair) ------------------
    Q("x198_session_baskets",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val ev = t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("is_new", (col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) >
              1800000000L).cast("long"))
          .withColumn("sid", sum(col("is_new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(concat_ws("#", col("user_id"), col("sid")).as("bk"),
            col("event_type").as("it"))
        graft.operators.Baskets.frequentPairs(ev, "bk", "it",
            minSupportMicro = 2000L, minItemCount = 2L,
            maxBasketSize = 64)
          .orderBy(col("item1"), col("item2"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sx AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS sid FROM x),
        b AS (SELECT DISTINCT user_id || '#' || CAST(sid AS VARCHAR)
            AS bk, event_type AS it FROM sx),
        n AS (SELECT count(DISTINCT bk) AS nb FROM b),
        ic AS (SELECT it, CAST(count(*) AS BIGINT) AS c
          FROM b GROUP BY 1),
        f AS (SELECT * FROM ic WHERE c >= 2),
        bf AS (SELECT b.bk, b.it, f.c FROM b JOIN f ON b.it = f.it),
        p2 AS (SELECT l.it AS item1, r.it AS item2, l.c AS c1,
            r.c AS c2, CAST(count(*) AS BIGINT) AS pair_count
          FROM bf l JOIN bf r ON l.bk = r.bk AND l.it < r.it
          GROUP BY 1, 2, 3, 4)
        SELECT item1, item2, c1, c2, pair_count,
          pair_count * 1000000 // nb AS support_micro,
          pair_count * 1000000 // c1 AS conf12_micro,
          pair_count * 1000000 // c2 AS conf21_micro,
          (pair_count * 1000000 // c1) * nb // c2 AS lift_micro
        FROM p2 CROSS JOIN n
        WHERE pair_count * 1000000 // nb >= 2000
        ORDER BY item1, item2""")),

    // ---- cross-lingual duplicate audit: do near-dup clusters span
    //      languages? — translated boilerplate / MT-copied content
    //      shows up as multi-language components; per multi-member
    //      cluster: members, distinct langs, the sorted lang list,
    //      and the cross_lingual flag ----------------------------------
    Q("x199_cross_lingual_dups",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
          maxRounds = 60)
        docs.select(col("doc_id"), col("lang"))
          .join(comp, docs("doc_id") === comp("v"))
          .groupBy(col("comp").as("component"))
          .agg(count(lit(1)).cast("long").as("n_members"),
            countDistinct(col("lang")).cast("long").as("n_langs"),
            array_join(array_sort(collect_set(col("lang"))), ",")
              .as("langs"))
          .withColumn("cross_lingual", col("n_langs") > 1L)
          .orderBy(col("component"))
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e.s, r.l FROM reach r JOIN edges e ON e.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v)
        SELECT c.component, CAST(count(*) AS BIGINT) AS n_members,
          CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
          array_to_string(list_sort(list(DISTINCT d.lang)), ',') AS langs,
          count(DISTINCT d.lang) > 1 AS cross_lingual
        FROM comp c JOIN documents d ON d.doc_id = c.v
        GROUP BY c.component ORDER BY c.component""")),

    // ---- the curation funnel, end to end: raw → quality (x28's four
    //      rules) → exact dedup (keep-first) → blocklist screen (x99's
    //      phrase hits) → with docs / tokens / 512-token sequences and
    //      retention micro at EVERY stage — the executive summary of
    //      the whole library in one oracle-checked query ---------------
    Q("x200_curation_funnel",
      (s, dir) => {
        val phrases = blocklistPhrases.map(_.split(" ", -1).toSeq)
        val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
          .withColumn("ts", tokens(col("text")))
          .withColumn("tok", nTokens(col("ts")).cast("long"))
          .persist()
        val q = d.filter(nTokens(col("ts")) >= 30 &&
          dupTokenRatio(col("ts")) <= 0.55 &&
          avgTokenLen(col("ts")) >= 4.0 && avgTokenLen(col("ts")) <= 5.0 &&
          stopwordRatio(col("ts")) > 0.0)
          .withColumn("h", md5(col("text")))
          .persist()
        val keepIds = q.groupBy(col("h")).agg(min(col("doc_id")).as("kid"))
        val dd = q.join(keepIds,
          q("h") === keepIds("h") && q("doc_id") === keepIds("kid"))
          .select(q("doc_id"), q("text"), q("tok"))
          .persist()
        val hitsTotal = aggregate(
          graft.expressions.TextExpressions.phraseHits(col("text"), phrases),
          lit(0L), (acc, x) => acc + x)
        val sc = dd.filter(hitsTotal === 0L)
        def stats(df: org.apache.spark.sql.DataFrame, idx: Int,
            name: String) = df.agg(
          count(lit(1)).cast("long").as("n_docs"),
          coalesce(sum(col("tok")), lit(0L)).cast("long").as("n_tokens"),
          coalesce(sum(expr("(tok + 511) DIV 512")), lit(0L))
            .cast("long").as("n_seqs_512"))
          .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"), col("n_seqs_512"))
        val raw = stats(d, 1, "raw")
        val stages = raw
          .unionByName(stats(q, 2, "quality"))
          .unionByName(stats(dd, 3, "exact_dedup"))
          .unionByName(stats(sc, 4, "blocklist"))
        val rawRow = raw.select(col("n_docs").as("rn"),
          col("n_tokens").as("rt"))
        stages.crossJoin(broadcast(rawRow))
          .select(col("stage_idx"), col("stage"), col("n_docs"),
            col("n_tokens"), col("n_seqs_512"),
            expr("n_docs * 1000000 DIV rn").as("docs_retained_micro"),
            expr("n_tokens * 1000000 DIV rt").as("tokens_retained_micro"))
          .orderBy(col("stage_idx"))
      },
      Some(s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS ts,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
          FROM documents),
        q AS (SELECT * FROM d WHERE len(ts) >= 30
          AND 1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts) <= 0.55
          AND CAST(list_sum(list_transform(ts, t -> length(t)))
            AS DOUBLE)/len(ts) BETWEEN 4.0 AND 5.0
          AND len(list_filter(ts,
            t -> t IN ('the','a','of','and','to','in','is'))) > 0),
        dd AS (SELECT q.* FROM q JOIN (SELECT md5(text) AS h,
            min(doc_id) AS kid FROM q GROUP BY 1) k
          ON md5(q.text) = k.h AND q.doc_id = k.kid),
        sc AS (SELECT * FROM dd WHERE
          ${blocklistPhrases.map(phraseCntSql).mkString(" + ")} = 0),
        s1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(coalesce(sum(tok), 0) AS BIGINT) AS t,
            CAST(coalesce(sum((tok + 511) // 512), 0) AS BIGINT) AS sq
          FROM d),
        s2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(coalesce(sum(tok), 0) AS BIGINT) AS t,
            CAST(coalesce(sum((tok + 511) // 512), 0) AS BIGINT) AS sq
          FROM q),
        s3 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(coalesce(sum(tok), 0) AS BIGINT) AS t,
            CAST(coalesce(sum((tok + 511) // 512), 0) AS BIGINT) AS sq
          FROM dd),
        s4 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(coalesce(sum(tok), 0) AS BIGINT) AS t,
            CAST(coalesce(sum((tok + 511) // 512), 0) AS BIGINT) AS sq
          FROM sc),
        st AS (SELECT CAST(1 AS BIGINT) AS stage_idx, 'raw' AS stage,
            n, t, sq FROM s1
          UNION ALL SELECT 2, 'quality', n, t, sq FROM s2
          UNION ALL SELECT 3, 'exact_dedup', n, t, sq FROM s3
          UNION ALL SELECT 4, 'blocklist', n, t, sq FROM s4)
        SELECT st.stage_idx, st.stage, st.n AS n_docs, st.t AS n_tokens,
          st.sq AS n_seqs_512,
          CAST(st.n * 1000000 // s1.n AS BIGINT) AS docs_retained_micro,
          CAST(st.t * 1000000 // s1.t AS BIGINT) AS tokens_retained_micro
        FROM st CROSS JOIN s1 ORDER BY stage_idx""")),

    // ---- streaming KMV cardinality ledger: bounded-state distinct
    //      tracking — k rows per batch instead of x175's full
    //      vocabulary set; bottom-k is mergeable, the estimate is
    //      long-exact integer arithmetic, and the exact distinct rides
    //      as the x70-style self-adjudicating verdict ------------------
    Q("x201_streaming_kmv_ledger",
      (s, dir) => {
        import graft.engine._
        import graft.functions.TextFunctions
        val shStream = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextFunctions.shingles(tokens(col("text")), 4))
              .as("sh"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("kmvlg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/kmvlg")
        s.sql("CREATE DATABASE IF NOT EXISTS kmvlg")
        s.sql("DROP TABLE IF EXISTS kmvlg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("kmvlg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingKmvLedger(s,
          landing.toString, shStream.schema, "kmvlg.ledger",
          ckpt.toString, col("sh"), k = 256)
        shStream.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        shStream.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        val kmv = EventStreams.mergeKmvLedger(s.table("kmvlg.ledger"), 256)
        // exact-distinct adjudicator over the LANDING parquet (the two
        // halves just written = the full shingle stream row-for-row):
        // reading it back skips a third shingle pass over the corpus —
        // within-query reuse of an intermediate the stream required
        // anyway, not cross-run caching
        val exact = s.read.parquet(landing.toString)
          .select(col("sh")).distinct()
          .agg(count(lit(1)).cast("long").as("exact_distinct"))
        kmv.crossJoin(broadcast(exact))
          // sign·(absdiff DIV): negative integral division truncates in
          // Spark but floors in DuckDB — keep the divide non-negative
          .withColumn("err_micro", expr(
            "CASE WHEN kmv_estimate >= exact_distinct THEN " +
              "(kmv_estimate - exact_distinct) * 1000000 DIV exact_distinct " +
              "ELSE -((exact_distinct - kmv_estimate) * 1000000 " +
              "DIV exact_distinct) END"))
          .withColumn("verdict_ok", abs(col("err_micro")) <= 190000L)
      },
      Some(s"""WITH sh AS (SELECT DISTINCT unnest(s) AS sh
          FROM (SELECT $shingleSql AS s FROM documents)),
        hs AS (SELECT md5(sh) AS h FROM sh),
        bot AS (SELECT h FROM hs ORDER BY h LIMIT 256),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, max(h) AS hk
          FROM bot),
        ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM sh),
        est AS (SELECT CAST(256 AS BIGINT) AS k_used, agg.n_rows,
            CAST(CASE WHEN agg.n_rows < 256 THEN agg.n_rows
              ELSE (255 * 4503599627370496)
                // greatest(CAST(concat('0x', substr(agg.hk, 1, 13))
                  AS BIGINT), 1) END AS BIGINT) AS kmv_estimate,
            ex.exact_distinct
          FROM agg CROSS JOIN ex)
        SELECT k_used, n_rows, kmv_estimate, exact_distinct,
          CAST(CASE WHEN kmv_estimate >= exact_distinct
            THEN (kmv_estimate - exact_distinct) * 1000000 // exact_distinct
            ELSE -((exact_distinct - kmv_estimate) * 1000000
              // exact_distinct) END AS BIGINT) AS err_micro,
          abs(CASE WHEN kmv_estimate >= exact_distinct
            THEN (kmv_estimate - exact_distinct) * 1000000 // exact_distinct
            ELSE -((exact_distinct - kmv_estimate) * 1000000
              // exact_distinct) END) <= 190000 AS verdict_ok
        FROM est""")),

    // ---- scorer gains table: does token-diversity rank predict the
    //      x28 quality gate? — decile cumulative lift over exact
    //      GlobalOrder ranks (no global window; the cumulative pass is
    //      a triangular join over the 10-row bucket table); lift at
    //      the top deciles is what earns a scorer its filter slot ------
    Q("x202_scorer_gains",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .withColumn("ts", tokens(col("text")))
          .withColumn("sc", expr(
            "size(array_distinct(ts)) * 1000000L DIV size(ts)"))
          .withColumn("y",
            nTokens(col("ts")) >= 30 && dupTokenRatio(col("ts")) <= 0.55 &&
            avgTokenLen(col("ts")) >= 4.0 && avgTokenLen(col("ts")) <= 5.0 &&
            stopwordRatio(col("ts")) > 0.0)
          .withColumn("k",
            lpad((lit(1000000L) - col("sc")).cast("string"), 7, "0"))
        graft.operators.GainsTable.byRank(base, "doc_id", "k", "y",
            parts = 10, bucketChars = 4, superChars = 2)
          .orderBy(col("bucket"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts
          FROM documents),
        f AS (SELECT doc_id,
            CAST(len(list_distinct(ts)) * 1000000 // len(ts) AS BIGINT)
              AS sc,
            (len(ts) >= 30
              AND 1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts)
                <= 0.55
              AND CAST(list_sum(list_transform(ts, t -> length(t)))
                AS DOUBLE)/len(ts) BETWEEN 4.0 AND 5.0
              AND len(list_filter(ts,
                t -> t IN ('the','a','of','and','to','in','is'))) > 0)
              AS y
          FROM d),
        kk AS (SELECT doc_id,
            lpad(CAST(1000000 - sc AS VARCHAR), 7, '0') AS key, y FROM f),
        p AS (SELECT doc_id, y,
            row_number() OVER (ORDER BY key, doc_id) AS pos FROM kk),
        n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM p),
        b AS (SELECT ((pos - 1) * 10 // nn) + 1 AS bucket, y
          FROM p CROSS JOIN n),
        per AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
              AS positives
          FROM b GROUP BY 1),
        g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
            CAST(sum(positives) AS BIGINT) AS gp FROM per),
        cum AS (SELECT a.bucket, a.n, a.positives,
            CAST(sum(b2.n) AS BIGINT) AS cum_n,
            CAST(sum(b2.positives) AS BIGINT) AS cum_positives
          FROM per a JOIN per b2 ON b2.bucket <= a.bucket
          GROUP BY 1, 2, 3)
        SELECT c.bucket, c.n, c.positives,
          CAST(c.positives * 1000000 // c.n AS BIGINT) AS rate_micro,
          c.cum_n, c.cum_positives,
          CAST(c.cum_positives * 1000000 // c.cum_n AS BIGINT)
            AS cum_rate_micro,
          CAST(c.cum_positives * g.gn * 1000000
            // (c.cum_n * g.gp) AS BIGINT) AS cum_lift_micro
        FROM cum c CROSS JOIN g ORDER BY bucket""")),

    // ---- BOUNDED-SCAN ANN: the BASELINE.md round-13 configuration law
    //      as an oracle-checked entry — planted-Gaussian-cluster fixture
    //      (the regime real embedding corpora live in at scale; shared
    //      with RecallProbe, seed 62), nlist scaled to the cluster
    //      count, nProbe=1 → ~3% measured scan; the full x62 IVF-PQ +
    //      refine chain must hold recall@5 ≥ 0.9 INSIDE that scan
    //      budget (x62's corpus-fixture config scans ~70% — a synthetic-
    //      data artifact, not the production shape; this is) ----------
    Q("x203_ivf_bounded_scan",
      (s, dir) => {
        import graft.operators.{Pq, Similarity, VectorFixtures}
        // cached: the fixture feeds training, all three adjudication
        // legs, and the exact baseline; recon's codebook-literal
        // reconstruction is expensive to re-evaluate per leg
        val e = VectorFixtures.plantedClusters(s, n = 4000,
          clusters = 32, dim = 64, noise = 0.25).persist()
        // recall adjudicated over a deterministic 1-in-10 query panel:
        // the CORPUS and the index stay full-size (that is what scan
        // fraction is measured against); only the exact-baseline cost
        // scales with the panel (10k×10k brute force is adjudication
        // overhead, not the operator under test)
        val eq = e.filter(col("vec_id") % 10 === 0)
        val cents = Similarity.trainKMeans(e, "vec_id", "embedding",
          k = 32, iters = 5)
        val centSeq = cents.orderBy(col("cell")).collect()
          .map(_.getSeq[Float](1)).toIndexedSeq
        val resid = Pq.residuals(e, "embedding", centSeq)
        val cbs = Pq.trainCodebooks(resid, "vec_id", "__resid",
          dim = 64, m = 16, ksub = 128, iters = 5)
        val recon = Pq.ivfPqReconstruct(e, "vec_id", "embedding",
          centSeq, cbs).select(col("vec_id"), col("recon").as("embedding"))
          .persist()
        val candidates = Similarity.ivfTopK(recon, eq, cents, "vec_id",
          "embedding", k = 50, nProbe = 1)
          .select(col("query_id"), col("neighbor_id"))
        val approx = Similarity.refineTopK(candidates, e, eq, "vec_id",
          "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val exact = Similarity.bruteForceTopKBroadcast(e, eq, "vec_id",
          "embedding", k = 5).select(col("query_id"), col("neighbor_id"))
        val recall = exact.join(approx.withColumn("hit", lit(1)),
            Seq("query_id", "neighbor_id"), "left")
          .agg(countDistinct(col("query_id")).cast("long").as("n_queries"),
            (sum(coalesce(col("hit"), lit(0))).cast("double")
              / count(lit(1)) >= 0.9).as("recall_ok"))
        val scan = Similarity.ivfScanStats(recon, eq, cents, "vec_id",
          "embedding", nProbe = 1)
          .select((col("scan_micro") <= 100000L).as("scan_ok"),
            col("n_corpus"))
        recall.crossJoin(broadcast(scan))
          .select(col("n_corpus").as("n_vectors"), col("n_queries"),
            lit(32L).as("nlist"), lit(1L).as("n_probe"),
            col("scan_ok"), col("recall_ok"))
      },
      Some("""SELECT CAST(4000 AS BIGINT) AS n_vectors,
          CAST(400 AS BIGINT) AS n_queries,
          CAST(32 AS BIGINT) AS nlist, CAST(1 AS BIGINT) AS n_probe,
          true AS scan_ok, true AS recall_ok""")),

    // ---- BPE ENCODE: x52's merge table applied as real token-id
    //      sequences per doc (vocab = post-merge distinct symbols, ids
    //      1..V lexicographic; id 0 = word separator so decode is exact
    //      — BpeSpec pins the round trip). What x35/x110 packing
    //      consumes once budgets move from counts to ids; the corpus
    //      pass is one explode + broadcast word→ids join + one doc-
    //      keyed reassembly (the x42 shuffle class). Oracle replays the
    //      single-row-state recursive training CTE, then the same
    //      vocab/encode relations in SQL --------------------------------
    Q("x204_bpe_encode",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.operators.Bpe.train(docs, "text",
          topK = bpeTopK, numMerges = bpeRounds)
        graft.operators.Bpe.encode(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_tokens"),
            concat_ws(",", col("token_ids")).as("ids_csv"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$bpeCtes,
        ws AS (SELECT u.w AS w, u.syms AS syms
          FROM (SELECT unnest(words) AS u FROM last)),
        vocab AS (SELECT sym,
            CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS id
          FROM (SELECT DISTINCT unnest(syms) AS sym FROM ws)),
        wex AS (SELECT w,
            unnest(list_transform(syms, (s, i) -> {'i': i, 's': s})) AS u
          FROM ws),
        wj AS (SELECT w, u.i AS i, v.id AS id
          FROM wex JOIN vocab v ON v.sym = u.s),
        wid0 AS (SELECT w,
            list_transform(list_sort(list({'i': i, 'id': id})),
              x -> x.id) AS ids
          FROM wj GROUP BY w),
        wid AS (SELECT w, ids FROM wid0
          UNION ALL SELECT w, CAST([] AS BIGINT[]) FROM ws
          WHERE len(syms) = 0),
        dt AS (SELECT doc_id,
            unnest(list_transform(string_split(text, ' '),
              (w, i) -> {'i': i, 'w': w})) AS u
          FROM documents),
        dj AS (SELECT doc_id, u.i AS i, wid.ids AS ids
          FROM dt JOIN wid ON wid.w = u.w),
        da AS (SELECT doc_id,
            flatten(list_transform(
              list_sort(list({'i': i, 'ids': ids})),
              (x, j) -> CASE WHEN j = 1 THEN x.ids
                ELSE [CAST(0 AS BIGINT)] || x.ids END)) AS enc
          FROM dj GROUP BY doc_id)
        SELECT doc_id, CAST(len(enc) AS BIGINT) AS n_tokens,
          array_to_string(enc, ',') AS ids_csv
        FROM da ORDER BY doc_id""")),

    // ---- UNIGRAM-LM TOKENIZER (Kudo ACL 2018 — SentencePiece's
    //      default): the OTHER subword tokenizer modern pipelines ship,
    //      completing the family x204's BPE opened. Viterbi-EM variant
    //      (hard E-step → all-integer piece-use counts, engine-
    //      replayable; costs are positive micro-nats so both engines'
    //      half-up rounding agrees); seed = char coverage + top head
    //      substrings, unused multi-char pieces pruned per round. Same
    //      id-0-separator encode surface and shuffle class as x204; the
    //      oracle replays seeding, both EM rounds (unrolled recursive-
    //      CTE Viterbi with a 3-deep rolling DP window), the final
    //      all-words Viterbi, and x204's assembly relations ------------
    Q("x209_unigram_encode",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.operators.Unigram.train(docs, "text",
          topK = uniTopK, maxPieceLen = uniMaxLen,
          multiPieces = uniMulti, rounds = uniRounds)
        graft.operators.Unigram.encode(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_tokens"),
            concat_ws(",", col("token_ids")).as("ids_csv"))
          .orderBy(col("doc_id"))
      },
      Some(s"""$uniCtes
        SELECT doc_id, CAST(len(enc) AS BIGINT) AS n_tokens,
          array_to_string(enc, ',') AS ids_csv
        FROM uda ORDER BY doc_id""")),

    // ---- TOKENIZER FERTILITY COMPARISON (x113's table over BOTH
    //      trained tokenizers): per-language whitespace vs BPE vs
    //      unigram subword counts on the same corpus — the "which
    //      tokenizer denominates budgets cheaper" readout. Subword
    //      counts EXCLUDE the id-0 separators (fertility = subwords per
    //      word); truncating-div micro ratios. Oracle composes the BPE
    //      and unigram training CTE chains in one WITH RECURSIVE -------
    Q("x210_tokenizer_fertility_compare",
      (s, dir) => {
        import graft.operators.{Bpe, Unigram}
        val docs = t(s, dir, "documents")
        val bpeModel = Bpe.train(docs, "text",
          topK = bpeTopK, numMerges = bpeRounds)
        val uniModel = Unigram.train(docs, "text",
          topK = uniTopK, maxPieceLen = uniMaxLen,
          multiPieces = uniMulti, rounds = uniRounds)
        val un = Unigram.wordSubtokens(docs, "text", uniModel)
          .withColumnRenamed("n_subtokens", "nu")
        docs.select(col("lang"),
            explode(split(col("text"), " ")).as("w"))
          .join(broadcast(bpeModel.wordSubtokens), Seq("w"))
          .join(broadcast(un), Seq("w"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_ws_tokens"),
            sum(col("n_subtokens")).as("n_bpe_tokens"),
            sum(col("nu")).as("n_uni_tokens"))
          .select(col("lang"), col("n_ws_tokens"), col("n_bpe_tokens"),
            col("n_uni_tokens"),
            expr("n_bpe_tokens * 1000000L DIV n_ws_tokens")
              .as("bpe_fertility_micro"),
            expr("n_uni_tokens * 1000000L DIV n_ws_tokens")
              .as("uni_fertility_micro"))
          .orderBy(col("lang"))
      },
      Some("WITH RECURSIVE " + bpeCtesBody("documents", bpeRounds) +
        "," + uniCtesBody("documents") + s""",
        bw AS (SELECT u.w AS w, CAST(len(u.syms) AS BIGINT) AS nb
          FROM (SELECT unnest(words) AS u FROM last)),
        un AS (SELECT w, CAST(len(ps) AS BIGINT) AS nu FROM finf),
        docw AS (SELECT lang, unnest(string_split(text, ' ')) AS w
          FROM documents),
        jj AS (SELECT lang, bw.nb, un.nu
          FROM docw JOIN bw USING (w) JOIN un USING (w)),
        g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_ws_tokens,
            CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
            CAST(sum(nu) AS BIGINT) AS n_uni_tokens
          FROM jj GROUP BY lang)
        SELECT lang, n_ws_tokens, n_bpe_tokens, n_uni_tokens,
          CAST(n_bpe_tokens * 1000000 // n_ws_tokens AS BIGINT)
            AS bpe_fertility_micro,
          CAST(n_uni_tokens * 1000000 // n_ws_tokens AS BIGINT)
            AS uni_fertility_micro
        FROM g ORDER BY lang""")),

    // ---- TAKEDOWN APPLIED (governance capstone): x114 audits, x115
    //      streams the intake — this EXECUTES the rewrite: publish the
    //      corpus as a 16-shard partitioned table, apply the takedown
    //      list via partition-scoped dynamic overwrite of ONLY the
    //      needs_rewrite shards, and report per shard that the ids are
    //      gone while untouched shards' files stayed byte-identical
    //      (the in-query files_intact verdict; TakedownRewriteSpec pins
    //      true byte identity) — the x46/x200 composite-oracle pattern
    //      over the InsertOverwrite discipline ---------------------------
    Q("x205_takedown_rewrite",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        s.sql("CREATE DATABASE IF NOT EXISTS tkdn")
        s.sql("DROP TABLE IF EXISTS tkdn.shards")
        Materializer.deleteRecursively(wh.resolve("tkdn.db/shards"))
        docs.select(col("doc_id"), col("source"), col("n_chars"),
            pmod(col("doc_id"), lit(16L)).as("shard"))
          .write.partitionBy("shard").format("parquet")
          .saveAsTable("tkdn.shards")
        val deletes = docs.filter(col("doc_id") % 97 === 3)
          .select(col("doc_id"))
        graft.operators.TakedownRewrite.rewriteShards(s, "tkdn.shards",
            deletes, "doc_id", "shard")
          .orderBy(col("shard").cast("long"))
      },
      Some("""WITH asg AS (SELECT doc_id, doc_id % 16 AS shard
            FROM documents),
        del AS (SELECT DISTINCT doc_id FROM documents
          WHERE doc_id % 97 = 3),
        ps AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs_before,
            CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_deleted
          FROM asg a LEFT JOIN del d USING (doc_id) GROUP BY 1)
        SELECT CAST(shard AS VARCHAR) AS shard, n_docs_before,
          n_deleted,
          CAST(n_docs_before - n_deleted AS BIGINT) AS n_docs_after,
          n_deleted > 0 AS rewritten, true AS ids_gone,
          true AS files_intact
        FROM ps ORDER BY CAST(shard AS BIGINT)""")),

    // ---- LEDGER TAKEDOWN PURGE: the governance capstone reaching the
    //      DERIVED stores (VERDICT r14 gap 1). x115's intake list fed
    //      x205's published-table rewrite — but the doc-keyed signature
    //      ledger still held the taken-down ids' postings: (a)
    //      compliance — doc-derived data outliving the takedown — and
    //      (b) semantics — a re-licensed copy could never re-enter,
    //      dropped as a duplicate of kept=true ghosts. purgeLedger
    //      drops the ids' rows; this entry adjudicates BOTH
    //      consequences: the purged ledger holds none of the ids
    //      (ledger_clean), and each deleted doc's text RE-SUBMITTED
    //      under a new id re-enters iff no SURVIVING canonical blocks
    //      it — copies of purged kept docs re-admit, copies whose
    //      original blocker remains licensed stay dropped. The FULL
    //      governance composition runs in-entry: the x115 intake list
    //      drives the x205 partition-scoped corpus rewrite (its
    //      all-shards ids_gone verdict lands as corpus_clean) AND the
    //      ledger purge — takedown is only done when BOTH stores are
    //      clean. Oracle replays ledger + purge + re-submission
    //      relationally; the rewrite verdict is a composed `true` ------
    Q("x208_ledger_takedown_purge",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
        val emptyPosts = Dedup.minhashBandPostings(
          docs.limit(0), "doc_id", "text")
        // one-batch ledger (the incremental composition is x50's
        // subject); persisted — read by kept_before, the purge, and
        // the hygiene count
        val ledger = Dedup.dedupBatchLedger(docs, emptyPosts,
          "doc_id", "text", n = 4, numHashes = 8, numBands = 4).persist()
        // the x115 intake list (same suppression-request population the
        // streaming-suppression entry accumulates)
        val deletes = docs.filter(col("doc_id") % 97 === 3)
          .select(col("doc_id"))
        // x205 composition: publish a shard table, apply the takedown
        // (partition-scoped rewrite), carry the all-shards verdict.
        // Own namespace — x205's tkdn.shards is rebuilt by ITS entry,
        // and registry sweeps run both in one session.
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        s.sql("CREATE DATABASE IF NOT EXISTS tkdnp")
        s.sql("DROP TABLE IF EXISTS tkdnp.shards")
        Materializer.deleteRecursively(wh.resolve("tkdnp.db/shards"))
        docs.select(col("doc_id"), col("source"),
            pmod(col("doc_id"), lit(16L)).as("shard"))
          .write.partitionBy("shard").format("parquet")
          .saveAsTable("tkdnp.shards")
        val corpusClean = graft.operators.TakedownRewrite.rewriteShards(
            s, "tkdnp.shards", deletes, "doc_id", "shard")
          .agg(expr("bool_and(ids_gone)").as("corpus_clean"))
        val purged = Dedup.purgeLedger(ledger, deletes).persist()
        // the re-licensed copies: same text, new ids above the cursor
        val resub = docs.filter(col("doc_id") % 97 === 3)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        val step2 = Dedup.dedupBatchLedger(resub,
          purged.filter(col("kept") && col("band") >= 0),
          "doc_id", "text", n = 4, numHashes = 8, numBands = 4)
        val readmit = step2.groupBy(col("doc"))
          .agg(max(col("kept")).as("readmitted"))
          .select((col("doc") - 10000000L).as("doc_id"),
            col("readmitted"))
        val keptBefore = ledger.groupBy(col("doc"))
          .agg(max(col("kept")).as("kept_before"))
          .select(col("doc").as("doc_id"), col("kept_before"))
        val clean = purged
          .join(deletes.select(col("doc_id").as("doc")), Seq("doc"),
            "left_semi")
          .agg((count(lit(1)) === 0L).as("ledger_clean"))
        deletes.join(keptBefore, Seq("doc_id"))
          .join(readmit, Seq("doc_id"))
          .crossJoin(broadcast(clean))
          .crossJoin(broadcast(corpusClean))
          .orderBy(col("doc_id"))
      },
      Some(ledgerPurgeOracleSql)),

    // ---- COUNT-MIN RETRACTION (r15 verdict gap 1 — governance reaching
    //      the ADDITIVE-SKETCH quadrant): a purged key's contributions
    //      sit ANONYMOUSLY in CM cells where x208's row purge cannot
    //      reach; CM linearity composes the cure — recompute the purged
    //      keys' sketch from the raw events (one semi-join-pruned pass,
    //      cost ∝ purged rows) and append it NEGATED (batch −2). The
    //      netted ledger IS the clean-events sketch, cell for cell, so
    //      the x87 estimate/verdict machinery holds EXACTLY — netting,
    //      not approximate deletion. Full composition in-entry: x94's
    //      two-batch streaming CM ledger → user-keyed delete list (the
    //      x115 intake population) → countMinRetraction appended to the
    //      ledger table → merged report over netted counters vs exact
    //      clean counts. Oracle rebuilds the whole sketch from the
    //      CLEAN events — one oracle shape pinning x87/x94/x211 --------
    Q("x211_countmin_retraction",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), zipfTerm.as("term"))
        val split = ev.agg(expr("(min(event_id) + max(event_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strcmr_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strcmr")
        s.sql("CREATE DATABASE IF NOT EXISTS strcmr")
        s.sql("DROP TABLE IF EXISTS strcmr.sketch")
        for (p <- Seq(landing, ckpt, wh.resolve("strcmr.db/sketch")))
          Materializer.deleteRecursively(p)
        ev.filter(col("event_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
        EventStreams.streamingCountMin(s, landing.toString, ev.schema,
          "strcmr.sketch", ckpt.toString, "term", depth = 4, width = 1024)
        ev.filter(col("event_id") > split)
          .write.mode("append").parquet(landing.toString)
        EventStreams.streamingCountMin(s, landing.toString, ev.schema,
          "strcmr.sketch", ckpt.toString, "term", depth = 4, width = 1024)
        // the landing parquet now holds exactly ev (both halves): the
        // delete list, the retraction's raw source, and the clean
        // adjudicator read it back instead of re-running the events
        // normalize+term projection three more times (within-query reuse
        // of a stream-required intermediate, the x201 discipline)
        val evLanded = s.read.parquet(landing.toString)
        val deletes = evLanded.filter(col("user_id") % 13 === 5)
          .select(col("user_id"))
        EventStreams.countMinRetraction(evLanded, deletes, "user_id", "term",
            depth = 4, width = 1024, batchId = -2L)
          .write.mode("append").format("parquet")
          .saveAsTable("strcmr.sketch")
        val clean = evLanded.join(deletes.distinct(), Seq("user_id"),
          "left_anti")
        val (counters, totals) =
          EventStreams.mergeCountMinLedger(s.table("strcmr.sketch"))
        graft.operators.HeavyHitters.countMinReportFromCounters(
          clean.select(col("term")), "term", counters, totals,
          depth = 4, width = 1024, topK = 8)
      },
      Some(countMinOracleSqlOver("WHERE user_id % 13 <> 5"))),

    // ---- BYTE-FALLBACK ENCODE (r15 verdict gap 2): the tokenizer
    //      family's loud-OOV contract meant one trained model could not
    //      encode unseen text at all — right for x204/x209's
    //      trained-on-this-corpus guarantee, but production encodes
    //      tomorrow's crawl. SentencePiece byte_fallback: an OOV
    //      character consumes its UTF-8 bytes as reserved byte tokens
    //      (ids V+1..V+256) at a per-byte cost floor no real piece
    //      reaches, so covered text encodes EXACTLY as x209 and OOV
    //      degrades to bytes instead of raising; decode reassembles the
    //      byte stream before UTF-8 (round-trip pinned by UnigramSpec,
    //      incl. multi-byte codepoints). Fixture: every doc gains the
    //      word "xz~é" — x/z/~ are ASCII absent from the corpus
    //      alphabet, é a 2-byte codepoint proving multi-byte fallback;
    //      the oracle replays the coalesced-cost Viterbi and the same
    //      hex byte-id arithmetic --------------------------------------
    Q("x212_unigram_byte_fallback",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.operators.Unigram.train(docs, "text",
          topK = uniTopK, maxPieceLen = uniMaxLen,
          multiPieces = uniMulti, rounds = uniRounds)
        val oov = docs.select(col("doc_id"),
          concat(col("text"), lit(" xz~é")).as("text"))
        graft.operators.Unigram
          .encodeWithByteFallback(oov, "doc_id", "text", model)
          .select(col("doc_id"), col("n_tokens"),
            concat_ws(",", col("token_ids")).as("ids_csv"))
          .orderBy(col("doc_id"))
      },
      Some("WITH RECURSIVE " + uniCtesBody("documents",
        encTable = "(SELECT doc_id, text || ' xz~é' AS text " +
          "FROM documents)", byteFallback = true) + s"""
        SELECT doc_id, CAST(len(enc) AS BIGINT) AS n_tokens,
          array_to_string(enc, ',') AS ids_csv
        FROM uda ORDER BY doc_id""")),

    // ---- TOKEN-LEDGER RETRACTION (the GROUP-TOTALS member of the
    //      additive family): x168's per-source docs/tokens ledger nets
    //      a doc-keyed delete list out via ONE negated partial
    //      recomputed from the raw corpus — merged totals must equal
    //      the clean-corpus aggregation, with a fully-purged group
    //      reporting (0, 0), its true current state (the x182
    //      fully-deleted-group convention). Same composition shape as
    //      x211; the same construction covers any (group → additive
    //      counts) ledger — drift count tables, hourly rates ----------
    Q("x213_token_ledger_retraction",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("toklgr_landing")
        val ckpt = wh.resolve("_graft_checkpoints/toklgr")
        s.sql("CREATE DATABASE IF NOT EXISTS toklgr")
        s.sql("DROP TABLE IF EXISTS toklgr.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("toklgr.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingTokenLedger(s,
          landing.toString, docs.schema, "toklgr.ledger", ckpt.toString,
          "source", nTokens(tokens(col("text"))))
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        val deletes = docs.filter(col("doc_id") % 97 === 3)
          .select(col("doc_id"))
        EventStreams.tokenLedgerRetraction(docs, deletes, "doc_id",
            "source", nTokens(tokens(col("text"))), batchId = -2L)
          .write.mode("append").format("parquet")
          .saveAsTable("toklgr.ledger")
        EventStreams.mergeTokenLedger(s.table("toklgr.ledger"), "source")
          .orderBy(col("source"))
      },
      Some("""SELECT source,
          CAST(sum(CASE WHEN doc_id % 97 = 3 THEN 0 ELSE 1 END)
            AS BIGINT) AS docs,
          CAST(sum(CASE WHEN doc_id % 97 = 3 THEN 0
            ELSE len(string_split(text,' ')) END) AS BIGINT) AS tokens
        FROM documents GROUP BY source ORDER BY source""")),

    // ---- BPE BYTE FALLBACK (x212's sibling — the family's OTHER
    //      trained tokenizer generalized to unseen text): an UNSEEN
    //      WORD segments by the standard BPE application rule —
    //      leftmost lowest-rank pair repeatedly (Bpe.applyMergesToWord,
    //      a mapPartitions over the distinct-unseen-word table only;
    //      train-corpus words keep their verbatim train-time
    //      segmentations, so covered text encodes EXACTLY as x204); a
    //      symbol outside x204's observed-symbol vocabulary (unseen
    //      char, or a mid-ladder merge product no training word
    //      retained) degrades to byte tokens V+1..V+256. Fixture: every
    //      doc gains " xz~é thecatx" — the first word all-OOV chars
    //      (é 2-byte), the second an UNSEEN word of in-corpus chars, so
    //      the merge-application path runs against real learned rules;
    //      the oracle replays merge application to unseen words with a
    //      recursive CTE over the learned merge list + the same hex
    //      byte-id arithmetic ------------------------------------------
    Q("x214_bpe_byte_fallback",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.operators.Bpe.train(docs, "text",
          topK = bpeTopK, numMerges = bpeRounds)
        val oov = docs.select(col("doc_id"),
          concat(col("text"), lit(" xz~é thecatx")).as("text"))
        graft.operators.Bpe
          .encodeWithByteFallback(oov, "doc_id", "text", model)
          .select(col("doc_id"), col("n_tokens"),
            concat_ws(",", col("token_ids")).as("ids_csv"))
          .orderBy(col("doc_id"))
      },
      Some("WITH RECURSIVE " + bpeCtesBody("documents", bpeRounds) + s""",
        encdocs AS (SELECT doc_id, text || ' xz~é thecatx' AS text
          FROM documents),
        ws AS (SELECT u.w AS w, u.syms AS syms
          FROM (SELECT unnest(words) AS u FROM last)),
        vocab AS (SELECT sym,
            CAST(row_number() OVER (ORDER BY sym) AS BIGINT) AS id
          FROM (SELECT DISTINCT unnest(syms) AS sym FROM ws)),
        vn AS (SELECT CAST(count(*) AS BIGINT) AS vn FROM vocab),
        mlist AS MATERIALIZED (SELECT merges FROM last),
        unseenw AS MATERIALIZED (SELECT w FROM (
            SELECT DISTINCT unnest(string_split(text,' ')) AS w
            FROM encdocs)
          WHERE w <> '' AND w NOT IN (SELECT w FROM ws)),
        uapp AS (
          SELECT w, 0 AS r, regexp_extract_all(w, '.') AS syms
          FROM unseenw
          UNION ALL
          SELECT w, r + 1,
            list_reduce(list_transform(syms, s -> [s]),
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.lft
                               AND x[1] = m.rgt
                THEN list_append(list_slice(acc, 1, len(acc) - 1),
                                 m.lft || m.rgt)
                ELSE list_append(acc, x[1]) END)
          FROM (SELECT u.w, u.r, u.syms,
                  (SELECT merges[u.r + 1] FROM mlist) AS m
                FROM uapp u
                WHERE u.r < (SELECT len(merges) FROM mlist))
        ),
        ufin AS (SELECT w, syms FROM uapp
          WHERE r = (SELECT len(merges) FROM mlist)),
        wsall AS (SELECT w, syms FROM ws
          UNION ALL SELECT w, syms FROM ufin),
        wex AS (SELECT w,
            unnest(list_transform(syms, (s, i) -> {'i': i, 's': s})) AS u
          FROM wsall),
        wj AS (SELECT w, u.i AS i,
            CASE WHEN v.id IS NOT NULL THEN [v.id]
                 ELSE list_transform(range(octet_length(encode(u.s))),
                   b -> vn + 1 + ('0x'||substr(hex(encode(u.s)),
                     CAST(b*2+1 AS INTEGER), 2))::BIGINT)
            END AS ids
          FROM wex LEFT JOIN vocab v ON v.sym = u.s CROSS JOIN vn),
        wid0 AS (SELECT w,
            flatten(list_transform(list_sort(list({'i': i, 'ids': ids})),
              x -> x.ids)) AS ids
          FROM wj GROUP BY w),
        wid AS (SELECT w, ids FROM wid0
          UNION ALL SELECT w, CAST([] AS BIGINT[]) FROM wsall
          WHERE len(syms) = 0),
        dt AS (SELECT doc_id,
            unnest(list_transform(string_split(text, ' '),
              (w, i) -> {'i': i, 'w': w})) AS u
          FROM encdocs),
        dj AS (SELECT doc_id, u.i AS i, wid.ids AS ids
          FROM dt JOIN wid ON wid.w = u.w),
        da AS (SELECT doc_id,
            flatten(list_transform(
              list_sort(list({'i': i, 'ids': ids})),
              (x, j) -> CASE WHEN j = 1 THEN x.ids
                ELSE [CAST(0 AS BIGINT)] || x.ids END)) AS enc
          FROM dj GROUP BY doc_id)
        SELECT doc_id, CAST(len(enc) AS BIGINT) AS n_tokens,
          array_to_string(enc, ',') AS ids_csv
        FROM da ORDER BY doc_id""")),

    // ---- QUANTILE-LEDGER RETRACTION (the HISTOGRAM member — with x211
    //      count-min cells and x213 group totals, the additive family's
    //      takedown surface is complete: cells, totals, histograms):
    //      x206's per-source weighted (value, weight) histogram nets a
    //      doc-keyed delete list out via one negated partial; the
    //      netted merge FAILS LOUDLY on any negative net (wrong raw
    //      source) and drops zeroed values so a fully-purged value
    //      cannot win a cumulative-weight boundary, then the x170
    //      quantile machinery over the clean histogram ------------------
    Q("x215_quantile_ledger_retraction",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("text"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("qtlgr_landing")
        val ckpt = wh.resolve("_graft_checkpoints/qtlgr")
        s.sql("CREATE DATABASE IF NOT EXISTS qtlgr")
        s.sql("DROP TABLE IF EXISTS qtlgr.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("qtlgr.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingQuantileLedger(s,
          landing.toString, docs.schema, "qtlgr.ledger", ckpt.toString,
          "source", "n_chars", nTokens(tokens(col("text"))).cast("long"))
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        val deletes = docs.filter(col("doc_id") % 97 === 3)
          .select(col("doc_id"))
        EventStreams.quantileLedgerRetraction(docs, deletes, "doc_id",
            "source", "n_chars", nTokens(tokens(col("text"))).cast("long"),
            batchId = -2L)
          .write.mode("append").format("parquet")
          .saveAsTable("qtlgr.ledger")
        EventStreams.mergeQuantileLedgerNetted(s.table("qtlgr.ledger"),
            "source", "n_chars", Seq(500000L, 900000L, 990000L))
          .orderBy(col("source"), col("pct_micro"))
      },
      Some("""WITH d AS (SELECT source, n_chars,
            CAST(len(string_split(text,' ')) AS BIGINT) AS tok
          FROM documents WHERE doc_id % 97 <> 3),
        h AS (SELECT source, n_chars AS v, CAST(sum(tok) AS BIGINT) AS cw
          FROM d GROUP BY 1, 2),
        c AS (SELECT source, v, cw,
            CAST(sum(cw) OVER (PARTITION BY source ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM h),
        t AS (SELECT source, CAST(sum(cw) AS BIGINT) AS tot
          FROM h GROUP BY 1),
        e AS (SELECT c.source, c.v, t.tot, CAST(q.p AS BIGINT) AS pct_micro
          FROM c JOIN t ON c.source = t.source
          CROSS JOIN unnest([500000, 900000, 990000]) AS q(p)
          WHERE c.cum * 1000000 >= CAST(q.p AS BIGINT) * t.tot)
        SELECT source, pct_micro, CAST(min(v) AS BIGINT) AS value_at,
          tot AS total_weight
        FROM e GROUP BY source, pct_micro, tot
        ORDER BY source, pct_micro""")),

    // ---- exact dedup: one hash aggregation -----------------------------
    Q("x01_dedup_exact",
      (s, dir) => Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("content_hash")),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        count(*) AS dup_count FROM documents
        GROUP BY md5(text) ORDER BY content_hash""")),

    // ---- n-gram Jaccard near-dups via inverted shingle index -----------
    Q("x02_jaccard_neardups",
      (s, dir) => Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 4, threshold = 0.2, maxDf = 100L)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc)
        SELECT doc_a, doc_b,
          CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) AS jaccard
        FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
        WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2
        ORDER BY doc_a, doc_b""")),

    // ---- containment near-dups (supersets Jaccard misses) --------------
    Q("x30_containment_pairs",
      (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"), "doc_id",
        "text", n = 4, threshold = 0.6, maxDf = 100L)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc)
        SELECT doc_a, doc_b,
          CAST(common AS DOUBLE)/least(sa.n_sh, sb.n_sh) AS containment
        FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
        WHERE CAST(common AS DOUBLE)/least(sa.n_sh, sb.n_sh) >= 0.6
        ORDER BY doc_a, doc_b""")),

    // ---- MinHash-LSH candidates + exact-Jaccard verification -----------
    Q("x03_minhash_lsh",
      (s, dir) => Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
        n = 4, numHashes = 8, numBands = 4)
        .orderBy(col("doc_a"), col("doc_b")),
      Some {
        val sigs = (0 until 8).map(i => s"${minhashSigSql(i)} AS h$i").mkString(", ")
        val bands = (0 until 4).map(b =>
          s"SELECT doc_id, s, $b AS band, h${2 * b}||h${2 * b + 1} AS key FROM sg")
          .mkString(" UNION ALL ")
        s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents
              WHERE len(string_split(text,' ')) >= 4),
          sg AS (SELECT doc_id, s, $sigs FROM tk),
          bands AS ($bands),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b,
            CAST(len(list_intersect(ta.s, tb.s)) AS DOUBLE)
              / len(list_distinct(ta.s || tb.s)) AS jaccard
          FROM cand JOIN tk ta ON doc_a = ta.doc_id JOIN tk tb ON doc_b = tb.doc_id
          ORDER BY doc_a, doc_b"""
      }),

    // ---- SimHash signature groups --------------------------------------
    Q("x04_simhash_groups",
      (s, dir) => Dedup.simhashGroups(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("simhash"), col("keep_id")),
      Some("""WITH sh AS (SELECT doc_id,
          array_to_string(list_transform(range(1, 65), j ->
            CASE WHEN list_sum(list_transform(list_distinct(string_split(text,' ')),
                   t -> CASE WHEN (((strpos('0123456789abcdef',
                        substr(md5(t), CAST((j-1)//4 + 1 AS INT), 1)) - 1)
                        >> CAST(3 - (j-1)%4 AS INT)) & 1) = 1
                     THEN 1 ELSE -1 END)) >= 0
            THEN '1' ELSE '0' END), '') AS simhash
          FROM documents)
        SELECT simhash, count(*) AS n_docs, min(doc_id) AS keep_id
        FROM sh GROUP BY simhash ORDER BY simhash, keep_id""")),

    // ---- SimHash Hamming-radius near-dups (banded; == all-pairs scan) --
    Q("x18_simhash_neardups",
      (s, dir) => Dedup.simhashNearDups(t(s, dir, "documents"),
        "doc_id", "text", radius = 3, bands = 4)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH sh AS (SELECT doc_id,
          array_to_string(list_transform(range(1, 65), j ->
            CASE WHEN list_sum(list_transform(list_distinct(string_split(text,' ')),
                   t -> CASE WHEN (((strpos('0123456789abcdef',
                        substr(md5(t), CAST((j-1)//4 + 1 AS INT), 1)) - 1)
                        >> CAST(3 - (j-1)%4 AS INT)) & 1) = 1
                     THEN 1 ELSE -1 END)) >= 0
            THEN '1' ELSE '0' END), '') AS sig
          FROM documents)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(len(list_filter(range(64),
            i -> substr(a.sig, i + 1, 1) <> substr(b.sig, i + 1, 1))) AS BIGINT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_filter(range(64),
            i -> substr(a.sig, i + 1, 1) <> substr(b.sig, i + 1, 1))) <= 3
        ORDER BY doc_a, doc_b""")),

    // ---- exact cosine top-k, broadcast-corpus scan (the declarative
    //      join+window twin lives in bruteForceTopK; SimilaritySpec
    //      asserts the two are identical) ---------------------------------
    Q("x05_knn_cosine",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        Similarity.bruteForceTopKBroadcast(e, e, "vec_id", "embedding", k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some {
        val d = dotSql.format("q.embedding", "q.embedding", "c.embedding")
        val nq = dotSql.format("embedding", "embedding", "embedding")
        s"""WITH e AS (SELECT vec_id, embedding, sqrt($nq) AS nrm FROM embeddings),
          p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              round($d / (q.nrm * c.nrm), 4) AS cos
            FROM e q JOIN e c ON q.vec_id <> c.vec_id)
          SELECT query_id, neighbor_id, cos, rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, neighbor_id) AS rank FROM p)
          WHERE rank <= 5 ORDER BY query_id, rank"""
      }),

    // ---- embedding cosine near-dup pairs -------------------------------
    Q("x06_embedding_neardups",
      (s, dir) => Dedup.embeddingNearDups(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.35)
        .orderBy(col("id_a"), col("id_b")),
      Some {
        val d = dotSql.format("a.embedding", "a.embedding", "b.embedding")
        val n = dotSql.format("embedding", "embedding", "embedding")
        s"""WITH e AS (SELECT vec_id, embedding, sqrt($n) AS nrm FROM embeddings)
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            round($d / (a.nrm * b.nrm), 4) AS cos
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          WHERE round($d / (a.nrm * b.nrm), 4) >= 0.35
          ORDER BY id_a, id_b"""
      }),

    // ---- embedding near-dups via signed-random-projection LSH blocking
    //      (the 100 TB scale path for x06: per-row sign bits, band-bucket
    //      join on ids only, exact-cosine verify on candidates; the oracle
    //      regenerates the identical md5-seeded hyperplanes).
    //      96 planes / 16 bands (6-bit keys = 64 buckets/band): measured
    //      candidate volume on this corpus is 556k of 2M possible pairs at
    //      sf0.1 (the round-3 2-bit keys produced 8M — MORE than brute
    //      force). Wider keys are how this scales: at production near-dup
    //      thresholds (cos>=0.9, p_bit=0.86) these same params give
    //      theoretical recall 1-(1-0.856^6)^16 = 0.9997. --------------------
    Q("x31_embedding_lsh_pairs",
      (s, dir) => Dedup.embeddingLshPairs(t(s, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.5, dim = 64,
        numPlanes = 96, numBands = 16)
        .orderBy(col("id_a"), col("id_b")),
      Some(srpOracleSql(numPlanes = 96, numBands = 16, threshold = 0.5,
        table = "embeddings"))),

    // ---- text quality + language heuristics ----------------------------
    Q("x07_text_quality",
      (s, dir) => {
        val toks = col("toks")
        t(s, dir, "documents")
          .withColumn("toks", tokens(col("text"))) // staged: split once/row
          .select(
            col("doc_id"),
            nTokens(toks).as("n_tokens"),
            nDistinctTokens(toks).as("n_distinct"),
            dupTokenRatio(toks).as("dup_ratio"),
            avgTokenLen(toks).as("avg_token_len"),
            stopwordRatio(toks).as("stopword_ratio"),
            langGuess(toks).as("lang_guess"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH x AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents)
        SELECT doc_id,
          len(ts) AS n_tokens,
          len(list_distinct(ts)) AS n_distinct,
          1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts) AS dup_ratio,
          CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)/len(ts) AS avg_token_len,
          CAST(len(list_filter(ts, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)/len(ts) AS stopword_ratio,
          CASE WHEN CAST(len(list_filter(ts, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)/len(ts) >= 0.05
               THEN 'en' ELSE 'unk' END AS lang_guess
        FROM x ORDER BY doc_id""")),

    // ---- token counting (whitespace + BPE-ish regex) -------------------
    Q("x08_token_counts",
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        nTokens(tokens(col("text"))).as("ws_tokens"),
        bpeishTokenCount(col("text")).as("bpeish_tokens"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        len(string_split(text,' ')) AS ws_tokens,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpeish_tokens
        FROM documents ORDER BY doc_id""")),

    // ---- winnowing document fingerprints (native one-pass expression;
    //      the HOF twin lives in TextFunctions, equality spec-checked) --
    Q("x09_winnow_fingerprints",
      (s, dir) => t(s, dir, "documents")
        .withColumn("fps", graft.expressions.TextExpressions
          .winnowFingerprintsNative(col("text"), 3, 4))
        .select(
          col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          array_min(col("fps")).as("fp_min"))
        .orderBy(col("doc_id")),
      Some("""WITH h AS (SELECT doc_id,
          list_transform(list_transform(range(len(string_split(text,' '))-2),
            i -> string_split(text,' ')[i+1]||'_'||string_split(text,' ')[i+2]||'_'||string_split(text,' ')[i+3]),
            t -> md5(t)) AS hs
          FROM documents),
        fp AS (SELECT doc_id, list_distinct(CASE WHEN len(hs) >= 4
            THEN list_transform(range(len(hs)-3),
                 i -> list_aggregate(list_slice(hs, i+1, i+4), 'min'))
            ELSE hs END) AS fps
          FROM h)
        SELECT doc_id, len(fps) AS n_fp, list_aggregate(fps, 'min') AS fp_min
        FROM fp ORDER BY doc_id""")),

    // ---- sessionization (30-min gap), window-function form -------------
    Q("x10_sessionize",
      (s, dir) => EventStreams.sessionizeBatch(t(s, dir, "events"), 30)
        .orderBy(col("user_id"), col("session_idx")),
      Some("""WITH x AS (SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM x)
        SELECT user_id, session_idx, count(*) AS n_events,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""")),

    // ---- sessionization via the NATIVE session_window operator (the
    //      built-in-first twin of x10; >= gap boundary by design) --------
    Q("x37_session_window",
      (s, dir) => EventStreams.sessionizeNative(t(s, dir, "events"), 30)
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH x AS (SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
               THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          count(*) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""")),

    // ---- structured-streaming hourly aggregation (== batch result) -----
    Q("x11_stream_hourly",
      (s, dir) => EventStreams.hourlyCounts(s, dir),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")),

    // ---- streaming exact dedup: doubled stream, watermark-bounded state,
    //      counts equal the single-copy batch counts ----------------------
    Q("x21_stream_dedup",
      (s, dir) => EventStreams.dedupCounts(s, dir),
      Some("""SELECT event_type, count(*) AS n FROM events
        GROUP BY event_type ORDER BY event_type""")),

    // ---- stream-stream interval join (click attribution) ---------------
    Q("x24_stream_join",
      (s, dir) => EventStreams.clickAttribution(s, dir),
      Some("""SELECT p.event_id, count(*) AS n_clicks
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        GROUP BY p.event_id ORDER BY p.event_id""")),

    // ---- the ENGINE's StreamingTable materialization end-to-end: a
    //      project ingests events via a streaming model (AvailableNow),
    //      the accumulated physical table is aggregated batch-side and
    //      checked against the plain batch oracle. Table + checkpoint
    //      are reset first so every invocation ingests exactly once. ----
    Q("x44_streaming_table_model",
      (s, dir) => {
        import graft.engine._
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val p = new Project(s, Target("dev", "strmq", threads = 2))
        p.source("raw", "events", ParquetPath(s"$dir/events.parquet"))
        p.model("ev_ingest", ModelConfig(materialized =
          Materialization.StreamingTable())) { ctx =>
          ctx.sourceStream("raw", "events")
            .select(col("event_type"), col("value"))
        }
        // deterministic rerun: full refresh drops table + offset log.
        // The warehouse dir outlives the in-memory catalog across JVMs,
        // so also remove the stale physical location a previous process
        // may have left (DROP TABLE can't see it).
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        for (sub <- Seq("strmq.db/ev_ingest",
            "_graft_checkpoints/strmq_ev_ingest"))
          Materializer.deleteRecursively(wh.resolve(sub))
        val res = p.run(select = "ev_ingest", fullRefresh = true)
        require(res.ok, s"streaming ingest failed: ${res.results}")
        s.table("strmq.ev_ingest")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double")
              .as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- multimodal payload metadata (binary column convention) --------
    Q("x12_multimodal_meta",
      (s, dir) => Multimodal.pack(t(s, dir, "documents"), "doc_id", "text", "text/plain")
        .select(col("id"), col("media_type"), col("n_bytes"), col("sha256"))
        .orderBy(col("id")),
      Some("""SELECT doc_id AS id, 'text/plain' AS media_type,
        octet_length(encode(text)) AS n_bytes, sha256(text) AS sha256
        FROM documents ORDER BY id""")),

    // ---- multimodal feature extraction over REAL pixels: deterministic
    //      gray-pattern fixtures (PNG two-band, JPEG/GIF constant) are
    //      encoded AND decoded with the JDK's own javax.imageio codecs;
    //      the 8-bin luminance histogram of the decoded raster is
    //      integer-exact arithmetic of the spec (grayscale ⇒ Rec.601
    //      luma = gray value; JPEG grays sit at bin centers 16+32k, so
    //      its ±2 lossy round-trip can't cross a bin edge) — hash-checked
    //      bin COUNTS, no float tolerance anywhere -----------------------
    Q("x13_multimodal_features",
      (s, dir) => {
        // repartition BEFORE the codec map: documents is one small
        // parquet split, but encode+decode is expensive per row — spread
        // the narrow (id, spec) rows across every core first (at 100 TB
        // the scan is already wide and this exchange is a no-op-sized
        // rebalance; here it buys 32× on the dominant cost)
        // range-partition + sort the cheap spec BY id up front: the same
        // 32x codec spread as the old round-robin repartition, plus the
        // codec chain stays order-preserving so no trailing orderBy has
        // to range-SAMPLE (= re-evaluate) the expensive opaque chain
        val packed = Multimodal.packPixelImages(s,
          pixelFixtureSpec(t(s, dir, "documents"))
            .repartitionByRange(s.sparkContext.defaultParallelism,
              col("doc_id"))
            .sortWithinPartitions("doc_id"),
          "doc_id", "fmt", "w", "h", "g_top", "g_bot").toDF()
        val feats = Multimodal.extractFeatures(s, packed).toDF()
        feats.select(
          (col("id") +: col("width").cast("long").as("width") +:
            col("height").cast("long").as("height") +:
            (0 until 8).map(b =>
              round(element_at(col("features"), b + 1) *
                col("width") * col("height"))
                .cast("long").as(s"c$b"))): _*)
      },
      Some(s"""WITH s AS ($pixelFixtureSpecSql)
        SELECT id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        ${(0 until 8).map(b =>
          s"""CAST(CASE WHEN g1//32 = $b THEN (h//2)*w ELSE 0 END
             + CASE WHEN g2//32 = $b THEN (h - h//2)*w ELSE 0 END
             AS BIGINT) AS c$b""").mkString(",\n        ")}
        FROM s ORDER BY id""")),

    // ---- multimodal resize + video-frame sampling, REAL end to end:
    //      still fixtures are decoded → nearest-neighbor rescaled →
    //      re-encoded in their own format → RE-decoded, and checked on
    //      decoded dims + luminance mass (nearest-neighbor introduces no
    //      new colors, so all 24x16=384 resized pixels stay in the source
    //      bands' bins — integer-exact); per doc a REAL multi-frame
    //      animated GIF is written via the ImageIO sequence writer, every
    //      2nd frame decoded back, its constant gray recovered as the
    //      argmax luminance bin --------------------------------------
    Q("x49_multimodal_resize_frames",
      (s, dir) => {
        // same pre-codec rebalance as x13 — the stills and the animated
        // GIFs each run ~3 codec passes per row off a one-split scan.
        // Only the codec path is repartitioned; the b1/b2 verdict side
        // stays on the raw (cheap, broadcastable) scan.
        val spec = pixelFixtureSpec(t(s, dir, "documents"))
        val packed = Multimodal.packPixelImages(s,
          spec.repartition(s.sparkContext.defaultParallelism),
          "doc_id", "fmt", "w", "h", "g_top", "g_bot").toDF()
        val resized = Multimodal
          .resizeImages(s, packed, targetW = 24, targetH = 16).toDF()
        // NOT broadcast-hinted: spec is corpus-sized (one row per doc) —
        // at 100 TB this must stay an id-shuffle join; AQE broadcasts it
        // on its own at bench scale
        val rp = Multimodal.extractFeatures(s, resized).toDF()
          .join(spec.select(col("doc_id").as("id"),
            expr("int(g_top DIV 32)").as("b1"),
            expr("int(g_bot DIV 32)").as("b2")), "id")
          .select(col("id"),
            col("width").cast("long").as("out_w"),
            col("height").cast("long").as("out_h"),
            (round(element_at(col("features"), col("b1") + 1) *
              col("width") * col("height")) +
              when(col("b2") === col("b1"), lit(0.0))
                .otherwise(round(element_at(col("features"), col("b2") + 1) *
                  col("width") * col("height"))))
              .cast("long").as("mass"))
        val gifs = Multimodal.packAnimatedGifs(s,
          t(s, dir, "documents").select(col("doc_id"),
            lit(16).as("fw"), lit(12).as("fh"),
            (lit(2) + pmod(col("doc_id"), lit(4))).cast("int").as("nf"),
            pmod(col("doc_id") * 29 + 5, lit(256)).cast("int").as("gb"),
            lit(37).as("gs"))
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", "fw", "fh", "nf", "gb", "gs").toDF()
        Multimodal.sampleFrames(s, gifs, stride = 2).toDF()
          .join(rp, "id")
          .select(col("id"), col("frame_idx"), col("n_frames"),
            col("frame_bin"), col("out_w"), col("out_h"), col("mass"))
          // materialize the narrow join output before the sort: both
          // codec chains reach the orderBy through broadcast joins (no
          // shuffle barrier), so the range-bounds sampling would
          // otherwise re-run every encode/decode pass a second time
          .localCheckpoint()
          .orderBy(col("id"), col("frame_idx"))
      },
      Some("""WITH s AS (SELECT doc_id AS id, 2 + doc_id % 4 AS nf,
          (doc_id*29 + 5) % 256 AS gb FROM documents),
        f AS (SELECT id, i, nf, gb FROM s
          CROSS JOIN (VALUES (0), (2), (4)) AS v(i) WHERE i < nf)
        SELECT id, CAST(i AS BIGINT) AS frame_idx,
          CAST(nf AS BIGINT) AS n_frames,
          CAST(((gb + i*37) % 256) // 32 AS INT) AS frame_bin,
          CAST(24 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
          CAST(384 AS BIGINT) AS mass
        FROM f ORDER BY id, frame_idx""")),

    // ---- as-of join: each purchase matched to the user's most recent
    //      preceding click (union+window, one shuffle — AsOfJoin doc) ----
    Q("x15_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"),
            col("event_id").as("click_event"))
        AsOfJoin.backward(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", rightPayload = Seq("click_event"))
          .select(col("event_id"), col("user_id"),
            col("asof_click_event").as("click_event"),
            (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, c.event_id AS click_event,
        epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id""")),

    // ---- binned range join: shipments within a week of selected order
    //      dates (equi-join on bins, not a nested-loop inequality join) --
    Q("x17_range_join",
      (s, dir) => {
        val epoch = lit("1970-01-01").cast("date")
        val iv = t(s, dir, "orders").filter(col("o_orderkey") % 997 === 0)
          .select(col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), epoch).as("start_d"))
          .withColumn("end_d", col("start_d") + 7)
        val pts = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            datediff(to_date(col("l_shipdate")), epoch).as("ship_d"))
        RangeJoin.pointInInterval(pts, iv, Nil, "ship_d", "start_d", "end_d",
          binWidth = 8)
          .select(col("o_orderkey"), col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            col("ship_d").cast("long").as("ship_d"))
          // ship_d in the sort: sf0.1 holds duplicate (l_orderkey,
          // l_linenumber) pairs with different shipdates, so the key
          // triple alone is not a total order (found by the sf0.1
          // oracle run — engines tie-broke differently)
          .orderBy(col("o_orderkey"), col("l_orderkey"),
            col("l_linenumber"), col("ship_d"))
      },
      Some("""SELECT o.o_orderkey, l.l_orderkey,
        CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
        CAST(date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE)) AS BIGINT) AS ship_d
        FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
              FROM orders WHERE o_orderkey % 997 = 0) o
        JOIN lineitem l ON CAST(l.l_shipdate AS DATE) >= o.od
                       AND CAST(l.l_shipdate AS DATE) <= o.od + 7
        ORDER BY o_orderkey, l_orderkey, l_linenumber, ship_d""")),

    // ---- F5: VariantType JSON path (try_parse_json / variant_get) ------
    Q("x16_variant_json",
      (s, dir) => t(s, dir, "events")
        .withColumn("v", try_parse_json(col("props")))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k"))
        .filter(col("k").isNotNull)
        .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
        ORDER BY event_id""")),

    // ---- duplicate clusters: connected components over near-dup pairs
    //      (A~B, B~C ⇒ {A,B,C} one cluster, one canonical survivor) ------
    Q("x19_dup_components",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
          maxRounds = 60)
        val labeled = docs.select(col("doc_id"))
          .join(comp, docs("doc_id") === comp("v"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("component"))
        labeled.withColumn("comp_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("component"))))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e.s, r.l FROM reach r JOIN edges e ON e.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v)
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
          count(*) OVER (PARTITION BY coalesce(c.component, d.doc_id)) AS comp_size
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
        ORDER BY doc_id""")),

    // ---- duplicate clusters again, via large-star/small-star (the
    //      O(log²)-round scale path for high-diameter graphs; must equal
    //      x19's hash-to-min labels exactly — same oracle) ---------------
    Q("x32_dup_components_star",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        val comp = Dedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
        val labeled = docs.select(col("doc_id"))
          .join(comp, docs("doc_id") === comp("v"), "left")
          .select(col("doc_id"),
            coalesce(col("comp"), col("doc_id")).as("component"))
        labeled.withColumn("comp_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("component"))))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e.s, r.l FROM reach r JOIN edges e ON e.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v)
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
          count(*) OVER (PARTITION BY coalesce(c.component, d.doc_id)) AS comp_size
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
        ORDER BY doc_id""")),

    // ---- benchmark decontamination: GPT-3-style n-gram collision rule
    //      (corpus = doc_id % 20 != 0, benchmark = the rest; a training
    //      doc sharing any 8-gram with the benchmark is dropped) --------
    Q("x33_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 20 === 0)
        val corpus = docs.filter(col("doc_id") % 20 =!= 0)
        Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH bench AS (
          SELECT DISTINCT unnest(${shingleSqlN(8)}) AS sh
          FROM documents WHERE doc_id % 20 = 0),
        corp AS (
          SELECT doc_id, unnest(${shingleSqlN(8)}) AS sh
          FROM documents WHERE doc_id % 20 <> 0),
        bad AS (SELECT DISTINCT doc_id FROM corp JOIN bench USING (sh))
        SELECT d.doc_id, d.source FROM documents d
        WHERE d.doc_id % 20 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM bad)
        ORDER BY doc_id""")),

    // ---- PII redaction: regexp_replace cascade over deterministically
    //      constructed pii-bearing text (patterns restricted to the
    //      Java-regex/RE2 common dialect; applied email→phone→ipv4 in
    //      BOTH engines) --------------------------------------------------
    Q("x34_pii_redaction",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val withPii = docs.withColumn("text2", concat_ws(" ", col("text"),
          concat(lit("user"), col("doc_id").cast("string"),
            lit("@example.com")),
          concat(lit("+1555"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")),
          lit("10.0.0.1")))
        withPii.select(col("doc_id"),
          redactPii(col("text2")).as("redacted"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(
            text || ' user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
            ' +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
            ' 10.0.0.1',
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '\+[0-9]{7,15}', '<PHONE>', 'g'),
            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g')
            AS redacted
        FROM documents ORDER BY doc_id""")),

    // ---- context-window packing: cumulative token fill into ~2048-token
    //      bins within hash shards (global ORDER BY would serialize on
    //      one partition; shards pack independently at scale) ------------
    Q("x35_pack_bins",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("n_tokens", nTokens(tokens(col("text"))))
        graft.operators.Sampling.packByTokenBudget(docs, "doc_id",
          "n_tokens", budget = 2048L, shards = 8)
          .select(col("doc_id"), col("shard").cast("long").as("shard"),
            col("bin"), col("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, doc_id % 8 AS shard,
          CAST(floor(COALESCE(SUM(len(string_split(text,' '))) OVER (
            PARTITION BY doc_id % 8 ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)
            AS BIGINT) AS bin,
          CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
        FROM documents ORDER BY doc_id""")),

    // ---- cross-doc repeated spans (exact-substring-dedup signal):
    //      positional 10-gram hashes grouped, spans in >= 2 docs --------
    Q("x36_repeated_spans",
      (s, dir) => Dedup.repeatedSpans(t(s, dir, "documents"),
        "doc_id", "text", n = 10, minDocs = 2L)
        .orderBy(col("span_hash")),
      Some("""WITH sp AS (SELECT doc_id AS doc,
          md5(unnest(list_transform(range(len(string_split(text,' '))-9),
            i -> string_split(text,' ')[i+1]||'_'||string_split(text,' ')[i+2]||'_'||string_split(text,' ')[i+3]||'_'||string_split(text,' ')[i+4]||'_'||string_split(text,' ')[i+5]||'_'||string_split(text,' ')[i+6]||'_'||string_split(text,' ')[i+7]||'_'||string_split(text,' ')[i+8]||'_'||string_split(text,' ')[i+9]||'_'||string_split(text,' ')[i+10]))) AS span_hash
          FROM documents)
        SELECT span_hash, count(DISTINCT doc) AS n_docs,
          count(*) AS n_occurrences, min(doc) AS first_doc
        FROM sp GROUP BY span_hash HAVING count(DISTINCT doc) >= 2
        ORDER BY span_hash""")),

    // ---- end-to-end dedup keep-list: one canonical survivor (min id)
    //      per connected near-dup cluster; everything else dropped -------
    Q("x27_dedup_keeplist",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
          maxRounds = 60)
        docs.join(comp, docs("doc_id") === comp("v"), "left")
          .filter(col("comp").isNull || col("comp") === col("doc_id"))
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e.s, r.l FROM reach r JOIN edges e ON e.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v)
        SELECT d.doc_id, d.source
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
        WHERE c.component IS NULL OR c.component = d.doc_id
        ORDER BY doc_id""")),

    // ---- Gopher/C4-style quality-filter cascade: per-rule flags + keep
    //      verdict (length, duplication, word-length band, stopword
    //      presence) — the canonical pretraining curation step ----------
    Q("x28_quality_filters",
      (s, dir) => {
        val toks = col("toks")
        t(s, dir, "documents")
          .withColumn("toks", tokens(col("text"))) // staged: split once/row
          .select(col("doc_id"),
            (nTokens(toks) >= 30).cast("long").as("r_len"),
            (dupTokenRatio(toks) <= 0.55).cast("long").as("r_dup"),
            (avgTokenLen(toks) >= 4.0 && avgTokenLen(toks) <= 5.0)
              .cast("long").as("r_word"),
            (stopwordRatio(toks) > 0.0).cast("long").as("r_stop"))
          .withColumn("keep",
            (col("r_len") + col("r_dup") + col("r_word") + col("r_stop") === 4)
              .cast("long"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH x AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        f AS (SELECT doc_id,
          CAST(len(ts) >= 30 AS BIGINT) AS r_len,
          CAST(1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts) <= 0.55 AS BIGINT) AS r_dup,
          CAST(CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)/len(ts) BETWEEN 4.0 AND 5.0 AS BIGINT) AS r_word,
          CAST(len(list_filter(ts, t -> t IN ('the','a','of','and','to','in','is'))) > 0 AS BIGINT) AS r_stop
          FROM x)
        SELECT doc_id, r_len, r_dup, r_word, r_stop,
          CAST(r_len + r_dup + r_word + r_stop = 4 AS BIGINT) AS keep
        FROM f ORDER BY doc_id""")),

    // ---- language-ID: stopword-profile argmax (the classic cheap
    //      n-gram-family langid; declared order breaks ties) --------------
    Q("x20_langid",
      (s, dir) => {
        import graft.functions.TextFunctions
        val profs = TextFunctions.langProfiles
        // native one-pass scorer (all profiles in one token walk); the
        // HOF twin profileScore() is spec-checked equal
        val base = t(s, dir, "documents").withColumn("sc",
          graft.expressions.TextExpressions
            .profileScores(col("text"), profs.map(_._2)))
        val scored = profs.zipWithIndex.foldLeft(base) {
          case (d, ((lang, _), i)) =>
            d.withColumn(s"c_$lang", element_at(col("sc"), i + 1))
        }
        scored.select(
          (col("doc_id") +: profs.map { case (l, _) => col(s"c_$l") }) :+
            langPredict(profs.map { case (l, _) => l -> col(s"c_$l") })
              .as("lang_pred"): _*)
          .orderBy(col("doc_id"))
      },
      Some("""WITH sc AS (SELECT doc_id,
          len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS c_en,
          len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','que','y','en','los'))) AS c_es,
          len(list_filter(string_split(text,' '), t -> t IN ('le','la','de','et','les','des','une'))) AS c_fr,
          len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','das','von','den','zu'))) AS c_de
          FROM documents)
        SELECT doc_id, c_en, c_es, c_fr, c_de,
          CASE WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
               WHEN c_es > 0 AND c_es >= c_fr AND c_es >= c_de THEN 'es'
               WHEN c_fr > 0 AND c_fr >= c_de THEN 'fr'
               WHEN c_de > 0 THEN 'de' ELSE 'unk' END AS lang_pred
        FROM sc ORDER BY doc_id""")),

    // ---- deterministic hash split (train/holdout): stable under rerun/
    //      reshuffle/backfill, zero-shuffle assignment ---------------------
    Q("x22_hash_split",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        graft.operators.Sampling.hashSplit(t(s, dir, "documents"), "doc_id")
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share", round(col("n") /
            sum(col("n")).over(Window.partitionBy(col("source"))), 4))
          .orderBy(col("source"), col("split"))
      },
      Some("""WITH s AS (SELECT source,
          CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'cd' THEN 'train'
               ELSE 'holdout' END AS split FROM documents)
        SELECT source, split, count(*) AS n,
          round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY source), 4) AS share
        FROM s GROUP BY source, split ORDER BY source, split""")),

    // ---- stratified per-source cap (anti-domination curation step) -----
    Q("x29_stratified_cap",
      (s, dir) => graft.operators.Sampling
        .capPerGroup(t(s, dir, "documents"), "source", "doc_id", n = 15)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id")),
      Some("""SELECT source, doc_id FROM (
          SELECT source, doc_id, row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents)
        WHERE rk <= 15 ORDER BY source, doc_id""")),

    // ---- weighted sampling (Efraimidis-Spirakis): 10 docs per source,
    //      selection probability ∝ token count, deterministic by id ------
    Q("x41_weighted_sample",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("wt", nTokens(tokens(col("text"))))
        graft.operators.Sampling
          .weightedSamplePerGroup(docs, "source", "doc_id", "wt", k = 10)
          .select(col("source"), col("doc_id"), col("wt"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""WITH w AS (SELECT source, doc_id,
            len(string_split(text,' ')) AS wt FROM documents),
        sck AS (SELECT source, doc_id, wt,
            round(-ln((CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,12)) AS BIGINT) + 1.0)
                      / 281474976710657.0) / wt, 8) AS skey
            FROM w WHERE wt > 0),
        r AS (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY skey, doc_id) AS rk FROM sck)
        SELECT source, doc_id, wt FROM r WHERE rk <= 10
        ORDER BY source, doc_id""")),

    // ---- document chunking: 64-token windows, stride 48 (16-token
    //      overlap), redundant suffix windows dropped -------------------
    Q("x42_chunk_documents",
      (s, dir) => graft.operators.Chunking.chunkByTokens(
        t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        sel AS (SELECT doc_id, ts,
                list_filter(range(0, len(ts), 48),
                            s -> s = 0 OR s + 16 < len(ts)) AS starts
                FROM t),
        ex AS (SELECT doc_id, ts, starts, unnest(range(len(starts))) AS ci
               FROM sel)
        SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
          array_to_string(list_slice(ts, starts[ci+1] + 1, starts[ci+1] + 64), ' ') AS chunk_text,
          CAST(least(64, len(ts) - starts[ci+1]) AS BIGINT) AS n_chunk_tokens
        FROM ex ORDER BY doc_id, chunk_idx""")),

    // ---- per-source corpus health report: doc/token volumes, exact-dup
    //      ratio, quality-pass share — the stats a curation run reads
    //      before choosing thresholds. All aggregates are integer-exact
    //      before any division, so no summation-order noise -------------
    Q("x47_corpus_stats",
      (s, dir) => {
        val toks = col("toks")
        t(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(nTokens(toks)).as("total_tokens"),
            round(sum(nTokens(toks)).cast("double") / count(lit(1)), 4)
              .as("mean_tokens"),
            round(lit(1.0) - countDistinct(md5(col("text"))).cast("double")
              / count(lit(1)), 4).as("dup_ratio"),
            round(sum(when(nTokens(toks) >= 30 &&
              dupTokenRatio(toks) <= 0.55 &&
              avgTokenLen(toks) >= 4.0 && avgTokenLen(toks) <= 5.0 &&
              stopwordRatio(toks) > 0.0, 1L).otherwise(0L)).cast("double")
              / count(lit(1)), 4).as("quality_share"))
          .orderBy(col("source"))
      },
      Some("""WITH x AS (SELECT source, text, string_split(text,' ') AS ts FROM documents)
        SELECT source, count(*) AS n_docs,
          CAST(sum(len(ts)) AS BIGINT) AS total_tokens,
          round(CAST(sum(len(ts)) AS DOUBLE)/count(*), 4) AS mean_tokens,
          round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)/count(*), 4) AS dup_ratio,
          round(CAST(sum(CASE WHEN len(ts) >= 30
            AND 1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts) <= 0.55
            AND CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)/len(ts) BETWEEN 4.0 AND 5.0
            AND len(list_filter(ts, t -> t IN ('the','a','of','and','to','in','is'))) > 0
            THEN 1 ELSE 0 END) AS DOUBLE)/count(*), 4) AS quality_share
        FROM x GROUP BY source ORDER BY source""")),

    // ---- temperature resampling (multilingual-mix rule, weight ∝
    //      n^(1/T), T=0.7 upsamples small sources): per-source quotas
    //      from decimal-exact weight sums, rows kept by md5-rank --------
    Q("x48_temperature_resample",
      (s, dir) => graft.operators.Sampling.temperatureResample(
        t(s, dir, "documents"), "source", "doc_id",
        temperature = 0.7, budget = 300L)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id")),
      Some("""WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
        w AS (SELECT source, CAST(round(CAST(n_s AS DOUBLE) ** (1.0/0.7), 6) AS DECIMAL(28,6)) AS w6 FROM c),
        t AS (SELECT sum(w6) AS w_tot FROM w),
        q AS (SELECT source, ceil(300.0 * CAST(w6 AS DOUBLE) / CAST(w_tot AS DOUBLE)) AS quota
              FROM w CROSS JOIN t),
        r AS (SELECT source, doc_id, row_number() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
              FROM documents)
        SELECT r.source, r.doc_id FROM r JOIN q USING (source)
        WHERE rk <= quota ORDER BY source, doc_id""")),

    // ---- int8 embedding quantization (4x ANN-index compression) --------
    Q("x23_quantize_embeddings",
      (s, dir) => t(s, dir, "embeddings")
        .withColumn("scale", quantScale(col("embedding")))   // staged
        .withColumn("qv", quantize(col("embedding"), col("scale")))
        .select(col("vec_id"),
          round(col("scale"), 6).as("scale6"),
          element_at(col("qv"), 1).as("q0"),
          element_at(col("qv"), 2).as("q1"),
          element_at(col("qv"), 3).as("q2"),
          round(quantMaxError(col("qv"), col("embedding"), col("scale")), 4)
            .as("max_err"))
        .orderBy(col("vec_id")),
      Some("""WITH s AS (SELECT vec_id, embedding,
          greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))/127.0, 1e-12) AS scale
          FROM embeddings),
        q AS (SELECT vec_id, scale,
          list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)/scale) AS BIGINT)) AS qv,
          embedding FROM s)
        SELECT vec_id, round(scale, 6) AS scale6,
          qv[1] AS q0, qv[2] AS q1, qv[3] AS q2,
          round(list_max(list_transform(range(len(qv)),
            i -> abs(qv[i+1]*scale - CAST(embedding[i+1] AS DOUBLE)))), 4) AS max_err
        FROM q ORDER BY vec_id""")),

    // ---- TF-IDF top terms per document ---------------------------------
    Q("x25_tfidf_top_terms",
      (s, dir) => graft.operators.Tfidf
        .topTerms(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank")),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (SELECT tf.doc_id, tf.term,
            round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS score
          FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS rank FROM scored)
        SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // ---- interval-overlap join: order fulfilment windows [orderdate,
    //      orderdate+14] overlapping sampled promo windows ---------------
    Q("x26_interval_overlap",
      (s, dir) => {
        val epoch = lit("1970-01-01").cast("date")
        val promos = t(s, dir, "orders").filter(col("o_orderkey") % 1499 === 0)
          .select(col("o_orderkey").as("promo_id"),
            datediff(to_date(col("o_orderdate")), epoch).as("p_start"))
          .withColumn("p_end", col("p_start") + 10)
        val fulfil = t(s, dir, "orders")
          .select(col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), epoch).as("f_start"))
          .withColumn("f_end", col("f_start") + 14)
        RangeJoin.intervalOverlap(fulfil, promos, Nil,
          "f_start", "f_end", "p_start", "p_end", binWidth = 16)
          .select(col("promo_id"), col("o_orderkey"),
            col("f_start").cast("long").as("f_start"))
          .orderBy(col("promo_id"), col("o_orderkey"))
      },
      Some("""SELECT p.promo_id, f.o_orderkey,
        CAST(f.f_start AS BIGINT) AS f_start
        FROM (SELECT o_orderkey AS promo_id,
                date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS p_start,
                date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 10 AS p_end
              FROM orders WHERE o_orderkey % 1499 = 0) p
        JOIN (SELECT o_orderkey,
                date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS f_start,
                date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 14 AS f_end
              FROM orders) f
          ON f.f_start <= p.p_end AND p.p_start <= f.f_end
        ORDER BY promo_id, o_orderkey""")),

    // ---- IVF approximate nearest neighbors. ANN results are
    //      approximate by nature, so the query adjudicates ITSELF: it
    //      computes recall@5 of the IVF result against the exact
    //      broadcast-kNN baseline (the x05 operator) and emits one row
    //      (n_queries, recall_ok) where recall_ok = recall >= 0.5 — the
    //      SimilaritySpec bound ("as good as the data allows": the
    //      synthetic embeddings are near-uniform in cosine space;
    //      exactness of the IVF mechanism itself is asserted by the
    //      all-cells-probe spec). The oracle asserts recall_ok is true,
    //      so a hash mismatch IS a failed recall bound and the driver
    //      carries an explicit pass/fail instead of a no_oracle row.
    //      SCALE SHAPE (the x203 pattern, round-15): the corpus and the
    //      index stay full-size, but recall is adjudicated over a
    //      deterministic size-bounded query panel (1-in-10 at the
    //      driver SFs, capped ~200 as the corpus grows), nlist scales
    //      with the corpus (cells stay ~1000 rows) and nProbe preserves
    //      the probed fraction — every leg's cost is panel×cell-sized
    //      or one linear corpus pass, so the r14 probe's 12×/decade
    //      all-queries × fixed-nlist quadratic is gone by construction. --
    Q("x14_ivf_ann",
      (s, dir) => {
        // cached: training, the ivf corpus side, and the exact baseline
        // all scan the corpus (the x203/x62 shared-legs lesson)
        val e = t(s, dir, "embeddings").persist()
        val n = e.count()
        // ivfScaleParams: panel/nlist/training-sample derivation shared
        // with x62 and the x14 slope-gate volume counter — identical to
        // the r15 parameters at every driver SF and on the 10x fixture
        val (panelMod, nlist, trainMod) = ivfScaleParams(n)
        val nProbe = math.max(3, 3 * nlist / 10)
        val eq = e.filter(col("vec_id") % panelMod === 0)
        val cents = Similarity.trainKMeans(
          e.filter(col("vec_id") % trainMod === 0), "vec_id", "embedding",
          k = nlist, iters = 5)
        val ivf = Similarity.ivfTopK(e, eq, cents, "vec_id", "embedding",
          k = 5, nProbe = nProbe).select(col("query_id"), col("neighbor_id"))
        val exact = Similarity.bruteForceTopKBroadcast(e, eq, "vec_id",
          "embedding", k = 5).select(col("query_id"), col("neighbor_id"))
        exact.join(ivf.withColumn("hit", lit(1)),
            Seq("query_id", "neighbor_id"), "left")
          .agg(countDistinct(col("query_id")).as("n_queries"),
            (sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))
              >= 0.5).as("recall_ok"))
      },
      Some("""SELECT count(*) AS n_queries, true AS recall_ok
        FROM embeddings
        WHERE vec_id % greatest(10, (SELECT count(*) FROM embeddings)
          // 200) = 0""")),

    // ---- repeated-span REMOVAL: the rewrite half of exact-substring
    //      dedup — x36 detects cross-doc spans, this emits the cleaned
    //      text with every covered word position excised -----------------
    Q("x38_remove_repeated_spans",
      (s, dir) => Dedup.removeRepeatedSpans(t(s, dir, "documents"),
        "doc_id", "text", n = 10, minDocs = 2L)
        .orderBy(col("doc_id")),
      Some("""WITH tt AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        sp AS (SELECT doc_id, ts, unnest(range(len(ts)-9)) AS pos FROM tt),
        h AS (SELECT doc_id, pos,
              md5(array_to_string(list_slice(ts, pos+1, pos+10), '_')) AS span_hash
              FROM sp),
        rep AS (SELECT span_hash FROM h
                GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2),
        bad AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS starts
                FROM h JOIN rep USING (span_hash) GROUP BY doc_id),
        jn AS (SELECT tt.doc_id, tt.ts, coalesce(bad.starts, []) AS starts
               FROM tt LEFT JOIN bad USING (doc_id)),
        kp AS (SELECT doc_id, ts,
               list_filter(range(len(ts)),
                 p -> len(list_filter(starts, s -> s <= p AND p <= s + 9)) = 0) AS keepj
               FROM jn)
        SELECT doc_id,
          coalesce(array_to_string(list_transform(keepj, p -> ts[p+1]), ' '), '') AS clean_text,
          CAST(len(ts) - len(keepj) AS BIGINT) AS n_removed
        FROM kp ORDER BY doc_id""")),

    // ---- SRP-LSH at the PRODUCTION parameterization (8-bit bands,
    //      cos >= 0.9): the scale parameters documented on
    //      embeddingLshPairs, verified instead of narrated. The test
    //      corpus has no high-cosine pairs (max ~0.6), so the fixture
    //      unions in a deterministic near-duplicate twin (every 16th
    //      component zeroed — exact in float32, cos ≈ 0.97) for every
    //      10th vector; the oracle regenerates the identical fixture and
    //      hyperplanes --------------------------------------------------
    Q("x39_srp_lsh_production",
      (s, dir) => {
        val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val twins = e.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i % 16 === 0, lit(0.0f)).otherwise(x))
              .as("embedding"))
        Dedup.embeddingLshPairs(e.unionByName(twins), "vec_id", "embedding",
          threshold = 0.9, dim = 64, numPlanes = 128, numBands = 16)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(srpOracleSql(numPlanes = 128, numBands = 16, threshold = 0.9,
        table = """(SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000 AS vec_id,
            list_transform(range(len(embedding)),
              i -> CASE WHEN i % 16 = 0 THEN CAST(0.0 AS FLOAT)
                   ELSE embedding[i+1] END) AS embedding
          FROM embeddings WHERE vec_id % 10 = 0)"""))),

    // ---- END-TO-END embedding-level dedup: SRP-LSH pairs → connected
    //      components (large/small-star) → one canonical survivor per
    //      cluster. Both engines see the IDENTICAL candidate graph (the
    //      oracle regenerates the same hyperplanes), so the keep-list is
    //      deterministic even though LSH recall < 1. CORPUS-SCALED band
    //      keys since round 16 (the r15 verdict's one remaining
    //      superlinear registry member): fixed 8-bit keys measured
    //      3.55×/decade — Σ-bucket² ≈ n²/256 per band grows ~100× per
    //      100× corpus. embeddingLshPairsScaled sizes bits so the
    //      expected bucket stays ≤ 8 rows (12 bands, 8–24 bits,
    //      maxBits-stride hyperplanes so the oracle truncates the same
    //      full-width key), bounding candidates at ≤ 96n — linear by
    //      construction, pinned by the slope gate's candidate-count
    //      ratio. At the driver SFs (n ≤ 2048) the derived width is the
    //      r15 8 bits; the layout stride changes which planes the 8
    //      bits read, so the keep-list differs from r15's — both
    //      engines regenerate it identically ---------------------------
    Q("x43_embedding_dedup_keeplist",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val pairs = Dedup.embeddingLshPairsScaled(emb, "vec_id",
          "embedding", threshold = 0.35, dim = 64, numBands = 12)
        val comp = Dedup.connectedComponentsStar(pairs, "id_a", "id_b")
        emb.join(comp, emb("vec_id") === comp("v"), "left")
          .filter(col("comp").isNull || col("comp") === col("vec_id"))
          .select(col("vec_id"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH RECURSIVE ${srpScaledCtes(numBands = 12,
          threshold = 0.35, table = "embeddings")},
        edges AS (SELECT id_a AS s, id_b AS d FROM pr
                  UNION SELECT id_b, id_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e2.s, r.l FROM reach r JOIN edges e2 ON e2.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v)
        SELECT emb.vec_id FROM embeddings emb
        LEFT JOIN comp c ON emb.vec_id = c.v
        WHERE c.component IS NULL OR c.component = emb.vec_id
        ORDER BY vec_id""")),

    // ---- END-TO-END curation pipeline: Gopher/C4 quality rules (x28's)
    //      → exact dedup keep (x01's) → benchmark decontamination
    //      (x33's) — the operators composed as one curation run, with
    //      one composite oracle proving the composition --------------------
    Q("x46_curation_pipeline",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val toks = col("toks")
        val quality = docs.withColumn("toks", tokens(col("text")))
          .filter(nTokens(toks) >= 30 &&
            dupTokenRatio(toks) <= 0.55 &&
            avgTokenLen(toks) >= 4.0 && avgTokenLen(toks) <= 5.0 &&
            stopwordRatio(toks) > 0.0)
          .drop("toks")
        val keep = Dedup.exact(quality, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val deduped = quality.join(keep, Seq("doc_id"), "left_semi")
        val corpus = deduped.filter(col("doc_id") % 20 =!= 0)
        val bench = docs.filter(col("doc_id") % 20 === 0)
        Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 8)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH x AS (SELECT doc_id, source, text,
            string_split(text,' ') AS ts FROM documents),
        q AS (SELECT doc_id, source, text FROM x
              WHERE len(ts) >= 30
                AND 1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts) <= 0.55
                AND CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE)/len(ts) BETWEEN 4.0 AND 5.0
                AND len(list_filter(ts, t -> t IN ('the','a','of','and','to','in','is'))) > 0),
        keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
        dd AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
        bench AS (SELECT DISTINCT unnest(${shingleSqlN(8)}) AS sh
                  FROM documents WHERE doc_id % 20 = 0),
        corp AS (SELECT doc_id, unnest(${shingleSqlN(8)}) AS sh
                 FROM dd WHERE doc_id % 20 <> 0),
        bad AS (SELECT DISTINCT doc_id FROM corp JOIN bench USING (sh))
        SELECT doc_id, source FROM dd
        WHERE doc_id % 20 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM bad)
        ORDER BY doc_id""")),

    // ---- corpus-trained bigram LM scoring (CCNet-style perplexity
    //      proxy): avg negative log-likelihood per doc under add-one-
    //      smoothed corpus bigram statistics; per-bigram log-probs are
    //      rounded + decimal-summed so the average is order-independent -
    Q("x40_lm_bigram_nll",
      (s, dir) => graft.operators.LmScore.bigramNll(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"$lmNllSql ORDER BY doc_id")),

    // ---- CCNet-style perplexity BUCKETS: per source, rank docs by the
    //      x40 LM score and split into head/middle/tail thirds — the
    //      published curation step that keeps 'head' (fluent) data and
    //      drops/downsamples the tail ---------------------------------
    Q("x45_perplexity_buckets",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        val scored = graft.operators.LmScore
          .bigramNll(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
        val w = Window.partitionBy("source")
          .orderBy(col("avg_nll"), col("doc_id"))
        scored
          .withColumn("nt", ntile(3).over(w))
          .withColumn("bucket", when(col("nt") === 1, "head")
            .when(col("nt") === 2, "middle").otherwise("tail"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            graft.functions.PortableMath.roundPortable(
              sum(col("avg_nll").cast(DecimalType(18, 4)))
                .cast("double") / count(lit(1)), 4).as("mean_nll"))
          .orderBy(col("source"), col("bucket"))
      },
      Some(s"""WITH scored AS ($lmNllSql),
        j AS (SELECT s.doc_id, s.avg_nll, d.source
              FROM scored s JOIN documents d USING (doc_id)),
        b AS (SELECT source, avg_nll,
              ntile(3) OVER (PARTITION BY source
                             ORDER BY avg_nll, doc_id) AS nt
              FROM j)
        SELECT source,
          CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
          count(*) AS n_docs,
          floor((CAST(sum(CAST(avg_nll AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*)) * 10000 + 0.5) / 10000 AS mean_nll
        FROM b GROUP BY source, nt ORDER BY source, bucket""")),

    // ---- INCREMENTAL corpus dedup end-to-end: the corpus arrives in two
    //      batches in a staging dir; an Incremental(Append) model keeps a
    //      signature LEDGER (doc, band, key, kept) and each run dedups
    //      only the NEW docs (cursor = max ledger doc) against the kept
    //      postings — history is never re-shingled. The oracle recomputes
    //      both batch verdicts from scratch, proving the two-run
    //      incremental composition equals the one-shot semantics --------
    Q("x50_incremental_dedup",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
        val split = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val staging = wh.resolve("incrq_staging")
        Materializer.deleteRecursively(staging)
        // the warehouse dir outlives the in-memory catalog across JVMs:
        // remove the stale physical table a previous process may have
        // left, or run 1's CTAS hits LOCATION_ALREADY_EXISTS (same
        // pattern as x44). DROP first — in a session where this query
        // already ran (registry-wide test sweeps), deleting files behind
        // the still-registered table leaves a cached listing of dead
        // files and the rebuild fails with FAILED_READ_FILE
        s.sql("DROP TABLE IF EXISTS incrq.dedup_ledger")
        Materializer.deleteRecursively(wh.resolve("incrq.db/dedup_ledger"))
        // fresh Project per run = two separate process invocations in
        // production; run 1 is full-refresh so reruns are deterministic
        def freshProject(): Project = {
          val p = new Project(s, Target("dev", "incrq", threads = 2))
          p.source("raw", "docs", ParquetPath(staging.toString))
          p.model("dedup_ledger", ModelConfig(materialized =
            Materialization.Incremental(None,
              Materialization.IncrementalStrategy.Append))) { ctx =>
            val arrived = ctx.source("raw", "docs")
            val (batch, keptPosts) =
              if (ctx.isIncremental) {
                val cursor = ctx.thisDf.agg(max(col("doc"))).first().getLong(0)
                (arrived.filter(col("doc_id") > cursor),
                  ctx.thisDf.filter(col("kept") && col("band") >= 0))
              } else
                (arrived, graft.operators.Dedup.minhashBandPostings(
                  arrived.limit(0), "doc_id", "text"))
            Dedup.dedupBatchLedger(batch, keptPosts, "doc_id", "text",
              n = 4, numHashes = 8, numBands = 4)
          }
          p
        }
        docs.filter(col("doc_id") <= split)
          .write.mode("overwrite").parquet(staging.toString)
        val r1 = freshProject().run(fullRefresh = true)
        require(r1.ok, s"incremental dedup run 1 failed: ${r1.results}")
        docs.filter(col("doc_id") > split)
          .write.mode("append").parquet(staging.toString)
        val r2 = freshProject().run()
        require(r2.ok, s"incremental dedup run 2 failed: ${r2.results}")
        s.table("incrq.dedup_ledger")
          .groupBy(col("doc"))
          .agg(max(col("kept")).as("kept"))
          .withColumn("batch",
            when(col("doc") <= split, 1L).otherwise(2L))
          .select(col("doc").as("doc_id"), col("kept"), col("batch"))
          .orderBy(col("doc_id"))
      },
      Some(minhashLedgerOracleSql)),

    // ---- STREAMING incremental dedup: the same two-batch ledger, but
    //      the incremental cursor is the file-source OFFSET LOG (two
    //      Trigger.AvailableNow runs over a landing dir; run 2's
    //      checkpoint skips run 1's files) — arrival order and id space
    //      are arbitrary, unlike x50's max-doc-id predicate. Identical
    //      oracle: the mechanisms must agree --------------------------
    Q("x58_streaming_dedup_ledger",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
        val split = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strldg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strldg")
        s.sql("CREATE DATABASE IF NOT EXISTS strldg")
        s.sql("DROP TABLE IF EXISTS strldg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("strldg.db/ledger")))
          Materializer.deleteRecursively(p)
        docs.filter(col("doc_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
        EventStreams.streamingDedupLedger(s, landing.toString, docs.schema,
          "strldg.ledger", ckpt.toString, "doc_id", "text")
        docs.filter(col("doc_id") > split)
          .write.mode("append").parquet(landing.toString)
        EventStreams.streamingDedupLedger(s, landing.toString, docs.schema,
          "strldg.ledger", ckpt.toString, "doc_id", "text")
        s.table("strldg.ledger")
          .groupBy(col("doc"))
          .agg(max(col("kept")).as("kept"))
          .withColumn("batch",
            when(col("doc") <= split, 1L).otherwise(2L))
          .select(col("doc").as("doc_id"), col("kept"), col("batch"))
          .orderBy(col("doc_id"))
      },
      Some(minhashLedgerOracleSql)),

    // ---- CCNet-style SUPERVISED quality scoring: x28's heuristic rules
    //      weak-label the corpus, a one-pass multinomial Naive Bayes
    //      generalizes them to a per-doc log-likelihood ratio (the
    //      fastText-classifier axis of CCNet next to x40's perplexity
    //      axis); pred-vs-label disagreements = review queue ------------
    Q("x51_nb_quality_score",
      (s, dir) => nbScored(s, dir).orderBy(col("doc_id")),
      Some(s"""$nbScoreSql ORDER BY doc_id""")),

    // ---- NB calibration report (Guo ICML'17): reliability bins + ECE
    //      over the x51 scorer — whether its CONFIDENCE (not just its
    //      ranking) can drive a curation threshold. Sigmoid of the llr,
    //      BIGINT micro-unit binning, totals-from-cells ECE ------------
    Q("x107_nb_calibration",
      (s, dir) => graft.operators.ClassifierCalibration
        .reliabilityReport(nbScored(s, dir))
        .orderBy(col("bin")),
      Some(s"""WITH sc AS ($nbScoreSql),
        pc AS (SELECT label, pred,
            round(1.0/(1.0+exp(-llr)), 6) AS p1 FROM sc),
        cf AS (SELECT (pred = (label = 1)) AS ok,
            round(CASE WHEN pred THEN p1 ELSE 1.0 - p1 END, 6) AS conf
          FROM pc),
        bn AS (SELECT conf, ok,
            least((CAST(round(conf*1000000) AS BIGINT)*10) // 1000000,
              9) AS bin
          FROM cf),
        cells AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(conf AS DECIMAL(18,6))) AS sconf,
            CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
              AS n_correct
          FROM bn GROUP BY bin),
        st AS (SELECT bin, n, n_correct,
            floor((CAST(sconf AS DOUBLE)/n) * 1000000 + 0.5) / 1000000
              AS mean_conf,
            CAST((n_correct*2000000 + n) // (2*n) AS DOUBLE)/1000000.0
              AS acc
          FROM cells),
        g AS (SELECT bin, n, n_correct, mean_conf, acc,
            floor(abs(acc - mean_conf) * 1000000 + 0.5) / 1000000
              AS gap FROM st),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
            sum(n * CAST(gap AS DECIMAL(18,6))) AS sg FROM g)
        SELECT bin, n, n_correct, mean_conf, acc, gap,
          floor((CAST(sg AS DOUBLE)/nt) * 1000000 + 0.5) / 1000000
            AS ece
        FROM g CROSS JOIN tot ORDER BY bin""")),

    // ---- corpus-trained BPE (Sennrich ACL 2016): the merge table the
    //      spark-side bounded merge loop learns (pair-count agg per
    //      round, ONE argmax row to the driver), verified exactly by a
    //      DuckDB single-row-state recursive CTE ----------------------
    Q("x52_bpe_merges",
      (s, dir) => graft.operators.Bpe.mergesDf(s,
        graft.operators.Bpe.train(t(s, dir, "documents"), "text",
          topK = bpeTopK, numMerges = bpeRounds))
        .orderBy(col("rank")),
      Some(s"""$bpeCtes
        SELECT u.rank AS rank, u.lft AS lft, u.rgt AS rgt,
          u.pair_count AS pair_count
        FROM (SELECT unnest(merges) AS u FROM last) ORDER BY rank""")),

    // ---- subword-aware token counts: retokenize the corpus under the
    //      trained merge table — the budget denominator x42 chunking /
    //      x35 packing actually need (whitespace counts understate by
    //      the subword_ratio) ---------------------------------------
    Q("x53_bpe_token_counts",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = graft.operators.Bpe.train(docs, "text",
          topK = bpeTopK, numMerges = bpeRounds)
        graft.operators.Bpe.subwordCounts(docs, "doc_id", "text", model)
          .orderBy(col("doc_id"))
      },
      Some(s"""$bpeCtes,
        wm AS (SELECT u.w AS w, u.ns AS ns FROM
          (SELECT unnest(list_transform(words,
             wd -> {'w': wd.w, 'ns': CAST(len(wd.syms) AS BIGINT)})) AS u
           FROM last)),
        dt AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
               FROM documents)
        SELECT doc_id, count(*) AS n_ws_tokens,
          CAST(sum(ns) AS BIGINT) AS n_bpe_tokens,
          round(CAST(sum(ns) AS DOUBLE) / count(*), 4) AS subword_ratio
        FROM dt JOIN wm USING (w) GROUP BY doc_id ORDER BY doc_id""")),

    // ---- multimodal payload near-dups: byte-block SimHash per
    //      media_type over the packed binary — the x18 banding machinery
    //      applied to payload bytes (two media types packed from the
    //      doc-id parity split; pairs never cross types) ---------------
    Q("x54_payload_neardups",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val packed = Multimodal
          .pack(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
            "text/plain")
          .unionByName(Multimodal.pack(
            docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
            "text/markdown"))
        Multimodal.payloadNearDups(packed, radius = 3, bands = 4,
            blockBytes = 4)
          .orderBy(col("media_type"), col("id_a"), col("id_b"))
      },
      Some("""WITH p AS (SELECT doc_id AS id,
          CASE WHEN doc_id % 2 = 0 THEN 'text/plain'
               ELSE 'text/markdown' END AS media_type,
          hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
          FROM documents),
        ds AS (SELECT id, media_type,
          list_transform(list_distinct(list_transform(range(nb - 3),
            i -> substr(hx, 2*i + 1, 8))), t -> md5(t)) AS digs
          FROM p WHERE nb >= 4),
        sh AS (SELECT id, media_type,
          array_to_string(list_transform(range(1, 65), j ->
            CASE WHEN list_sum(list_transform(digs,
                   d -> CASE WHEN (((strpos('0123456789abcdef',
                        substr(d, CAST((j-1)//4 + 1 AS INT), 1)) - 1)
                        >> CAST(3 - (j-1)%4 AS INT)) & 1) = 1
                     THEN 1 ELSE -1 END)) >= 0
            THEN '1' ELSE '0' END), '') AS sig
          FROM ds)
        SELECT a.media_type, a.id AS id_a, b.id AS id_b,
          CAST(len(list_filter(range(64),
            i -> substr(a.sig, i + 1, 1) <> substr(b.sig, i + 1, 1))) AS BIGINT) AS hamming
        FROM sh a JOIN sh b
          ON a.media_type = b.media_type AND a.id < b.id
        WHERE len(list_filter(range(64),
            i -> substr(a.sig, i + 1, 1) <> substr(b.sig, i + 1, 1))) <= 3
        ORDER BY a.media_type, id_a, id_b""")),

    // ---- URL/domain curation: C4-style canonicalization + per-domain
    //      volume/dup stats + the anti-domination cap (composes
    //      Sampling.capPerGroup; kept_id_sum pins the md5-rank SELECTION,
    //      not just its size). Pseudo-URLs are derived deterministically
    //      from the fixture's source column with messy scheme/case/www/
    //      query/fragment variants that must all collapse --------------
    Q("x55_url_domain_curation",
      (s, dir) => {
        val url = expr("""CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN 'https://www.' || source || '.example.com/page/' ||
            CAST(doc_id DIV 40 AS STRING) || '?utm_source=feed'
          WHEN 1 THEN 'HTTP://' || upper(source) || '.Example.COM/page/' ||
            CAST(doc_id DIV 40 AS STRING) || '#Section'
          WHEN 2 THEN 'https://' || source || '.example.com/page/' ||
            CAST(doc_id DIV 40 AS STRING) || '/'
          ELSE source || '.example.com/page/' || CAST(doc_id DIV 40 AS STRING)
          END""")
        graft.operators.UrlCuration.domainStats(
            t(s, dir, "documents").withColumn("url", url),
            "url", "text", "doc_id", capN = 10)
          .orderBy(col("domain"))
      },
      Some("""WITH u AS (SELECT doc_id, text,
          CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'https://www.' || source || '.example.com/page/' ||
              CAST(doc_id // 40 AS VARCHAR) || '?utm_source=feed'
            WHEN 1 THEN 'HTTP://' || upper(source) || '.Example.COM/page/' ||
              CAST(doc_id // 40 AS VARCHAR) || '#Section'
            WHEN 2 THEN 'https://' || source || '.example.com/page/' ||
              CAST(doc_id // 40 AS VARCHAR) || '/'
            ELSE source || '.example.com/page/' || CAST(doc_id // 40 AS VARCHAR)
          END AS url FROM documents),
        c AS (SELECT doc_id, text,
          regexp_replace(regexp_replace(regexp_replace(
            lower(split_part(split_part(url, '#', 1), '?', 1)),
            '^[a-z][a-z0-9+.-]*://', ''), '^www\.', ''), '/+$', '') AS curl
          FROM u),
        d AS (SELECT doc_id, text, curl,
          split_part(split_part(curl, '/', 1), ':', 1) AS domain FROM c),
        k AS (SELECT domain, doc_id,
          row_number() OVER (PARTITION BY domain
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM d),
        ks AS (SELECT domain, count(*) AS n_kept,
          CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
          FROM k WHERE rk <= 10 GROUP BY domain),
        st AS (SELECT domain, count(*) AS n_docs,
          count(DISTINCT curl) AS n_urls,
          round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE)/count(*), 4)
            AS dup_ratio
          FROM d GROUP BY domain)
        SELECT st.domain, n_docs, n_urls, dup_ratio, n_kept, kept_id_sum
        FROM st JOIN ks USING (domain) ORDER BY domain""")),

    // ---- INCREMENTAL embedding dedup: x50's ledger pattern over SRP
    //      signatures — vectors arrive in two batches, an Incremental/
    //      Append model keeps the (doc, band, key, kept) ledger, and each
    //      run projects only the NEW batch (history never re-projected).
    //      Oracle recomputes both batch verdicts from scratch -----------
    Q("x56_incremental_embedding_dedup",
      (s, dir) => {
        import graft.engine._
        val vecs = t(s, dir, "embeddings")
        val split = vecs.agg(expr("(min(vec_id) + max(vec_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val staging = wh.resolve("incrv_staging")
        Materializer.deleteRecursively(staging)
        s.sql("DROP TABLE IF EXISTS incrv.vec_ledger")
        Materializer.deleteRecursively(wh.resolve("incrv.db/vec_ledger"))
        def freshProject(): Project = {
          val p = new Project(s, Target("dev", "incrv", threads = 2))
          p.source("raw", "vecs", ParquetPath(staging.toString))
          p.model("vec_ledger", ModelConfig(materialized =
            Materialization.Incremental(None,
              Materialization.IncrementalStrategy.Append))) { ctx =>
            val arrived = ctx.source("raw", "vecs")
            val (batch, keptPosts) =
              if (ctx.isIncremental) {
                val cursor = ctx.thisDf.agg(max(col("doc"))).first().getLong(0)
                (arrived.filter(col("vec_id") > cursor),
                  ctx.thisDf.filter(col("kept") && col("band") >= 0))
              } else
                (arrived, Dedup.srpBandPostings(
                  arrived.limit(0), "vec_id", "embedding", dim = 64))
            Dedup.embeddingDedupBatchLedger(batch, keptPosts,
              "vec_id", "embedding", dim = 64, numPlanes = 64, numBands = 8)
          }
          p
        }
        vecs.filter(col("vec_id") <= split)
          .write.mode("overwrite").parquet(staging.toString)
        val r1 = freshProject().run(fullRefresh = true)
        require(r1.ok, s"incremental embedding dedup run 1 failed: ${r1.results}")
        vecs.filter(col("vec_id") > split)
          .write.mode("append").parquet(staging.toString)
        val r2 = freshProject().run()
        require(r2.ok, s"incremental embedding dedup run 2 failed: ${r2.results}")
        s.table("incrv.vec_ledger")
          .groupBy(col("doc"))
          .agg(max(col("kept")).as("kept"))
          .withColumn("batch",
            when(col("doc") <= split, 1L).otherwise(2L))
          .select(col("doc").as("vec_id"), col("kept"), col("batch"))
          .orderBy(col("vec_id"))
      },
      Some(srpLedgerOracleSql)),

    // ---- the round-8 operators composed into ONE nightly training-mix
    //      pipeline, hash-checked end to end: provenance (URL canon +
    //      anti-domination cap) → supervised quality (NB keep) → exact
    //      dedup → subword-budget packing (BPE counts, not whitespace).
    //      Every stage is the registered operator, not a re-derivation --
    Q("x57_training_mix_pipeline",
      (s, dir) => {
        import graft.operators.{Bpe, NbQuality, Sampling, UrlCuration}
        val docs = t(s, dir, "documents")
        val url = expr("""CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN 'https://www.' || source || '.example.com/page/' ||
            CAST(doc_id DIV 40 AS STRING) || '?utm_source=feed'
          WHEN 1 THEN 'HTTP://' || upper(source) || '.Example.COM/page/' ||
            CAST(doc_id DIV 40 AS STRING) || '#Section'
          WHEN 2 THEN 'https://' || source || '.example.com/page/' ||
            CAST(doc_id DIV 40 AS STRING) || '/'
          ELSE source || '.example.com/page/' || CAST(doc_id DIV 40 AS STRING)
          END""")
        val withDomain = docs.withColumn("url", url)
          .withColumn("domain",
            UrlCuration.domainOf(UrlCuration.canonicalUrl(col("url"))))
          .drop("url")
        val capped = Sampling.capPerGroup(withDomain, "domain", "doc_id", 15)
        val toks = col("toks")
        val labeled = capped.withColumn("toks", tokens(col("text")))
          .withColumn("label",
            (nTokens(toks) >= 30 && dupTokenRatio(toks) <= 0.55 &&
              avgTokenLen(toks) >= 4.0 && avgTokenLen(toks) <= 5.0 &&
              stopwordRatio(toks) > 0.0).cast("long"))
          .drop("toks")
        // quality gate = the weak rules; the NB llr rides along as the
        // smooth score (on this synthetic corpus token identity carries
        // little of the rules' length/ratio signal, so pred alone would
        // keep ~3% — the rule gate + score annotation is the production
        // mix: filter hard, rank soft)
        val q = capped.join(
          NbQuality.naiveBayesScore(labeled, "doc_id", "text", "label")
            .filter(col("label") === 1).select("doc_id", "llr"), "doc_id")
        val keep = Dedup.exact(q, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        // persisted: the deduped corpus feeds THREE consumers (BPE
        // training's word dictionary, the subword recount, the final
        // domain/llr join) — unpersisted, the whole cap→NB→dedup prefix
        // would recompute per consumer (same residency trade as
        // LmScore.bigramNll)
        val dd = q.join(keep, Seq("doc_id"), "left_semi").persist()
        val model = Bpe.train(dd, "text", topK = bpeTopK, numMerges = 20)
        Sampling.packByTokenBudget(
            Bpe.subwordCounts(dd, "doc_id", "text", model),
            "doc_id", "n_bpe_tokens", budget = 2048L, shards = 4)
          .join(dd.select("doc_id", "domain", "llr"), "doc_id")
          .select(col("doc_id"), col("domain"), col("llr"),
            col("n_ws_tokens"), col("n_bpe_tokens"),
            col("shard").cast("long").as("shard"), col("bin"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE
        u AS (SELECT doc_id, text,
          CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'https://www.' || source || '.example.com/page/' ||
              CAST(doc_id // 40 AS VARCHAR) || '?utm_source=feed'
            WHEN 1 THEN 'HTTP://' || upper(source) || '.Example.COM/page/' ||
              CAST(doc_id // 40 AS VARCHAR) || '#Section'
            WHEN 2 THEN 'https://' || source || '.example.com/page/' ||
              CAST(doc_id // 40 AS VARCHAR) || '/'
            ELSE source || '.example.com/page/' || CAST(doc_id // 40 AS VARCHAR)
          END AS url FROM documents),
        dmn AS (SELECT doc_id, text,
          split_part(split_part(
            regexp_replace(regexp_replace(regexp_replace(
              lower(split_part(split_part(url, '#', 1), '?', 1)),
              '^[a-z][a-z0-9+.-]*://', ''), '^www\\.', ''), '/+$$', ''),
            '/', 1), ':', 1) AS domain FROM u),
        cap AS (SELECT doc_id, text, domain FROM
          (SELECT dmn.*, row_number() OVER (PARTITION BY domain
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM dmn)
          WHERE rk <= 15),
        lab AS (SELECT doc_id, string_split(text,' ') AS ts,
          CAST(len(string_split(text,' ')) >= 30
           AND 1.0 - CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)/len(string_split(text,' ')) <= 0.55
           AND CAST(list_sum(list_transform(string_split(text,' '), t -> length(t))) AS DOUBLE)/len(string_split(text,' ')) BETWEEN 4.0 AND 5.0
           AND len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) > 0
          AS BIGINT) AS label FROM cap),
        tok AS (SELECT doc_id, label, unnest(ts) AS w FROM lab),
        tot AS (SELECT
          sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS nt1,
          sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nt0,
          count(DISTINCT CASE WHEN label = 1 THEN doc_id END) AS nd1,
          count(DISTINCT CASE WHEN label = 0 THEN doc_id END) AS nd0,
          count(DISTINCT w) AS vsz FROM tok),
        wc AS (SELECT w,
          sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS c1,
          sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS c0
          FROM tok GROUP BY w),
        lp AS (SELECT w,
          CAST(round(ln((c1 + 1.0) / (nt1 + vsz)), 6) AS DECIMAL(18,6)) AS lp1,
          CAST(round(ln((c0 + 1.0) / (nt0 + vsz)), 6) AS DECIMAL(18,6)) AS lp0
          FROM wc CROSS JOIN tot),
        pri AS (SELECT
          CAST(round(ln((nd1 + 1.0) / (nd1 + nd0 + 2.0)), 6) AS DECIMAL(18,6)) AS lpr1,
          CAST(round(ln((nd0 + 1.0) / (nd1 + nd0 + 2.0)), 6) AS DECIMAL(18,6)) AS lpr0
          FROM tot),
        sc AS (SELECT doc_id, sum(lp1) AS s1, sum(lp0) AS s0
          FROM tok JOIN lp USING (w) GROUP BY doc_id),
        qk AS (SELECT doc_id,
          CAST(round((s1 + lpr1) - (s0 + lpr0), 4) AS DOUBLE) AS llr
          FROM sc JOIN lab USING (doc_id) CROSS JOIN pri WHERE label = 1),
        q AS (SELECT cap.doc_id, cap.text, cap.domain, qk.llr
              FROM cap JOIN qk USING (doc_id)),
        keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
        dd AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
        ${bpeCtesBody("dd", 20)},
        wm AS (SELECT uu.w AS w, uu.ns AS ns FROM
          (SELECT unnest(list_transform(words,
             wd -> {'w': wd.w, 'ns': CAST(len(wd.syms) AS BIGINT)})) AS uu
           FROM last)),
        cnt AS (SELECT doc_id, count(*) AS n_ws_tokens,
          CAST(sum(ns) AS BIGINT) AS n_bpe_tokens
          FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM dd)
          JOIN wm USING (w) GROUP BY doc_id)
        SELECT cnt.doc_id, dd.domain, dd.llr, cnt.n_ws_tokens,
          cnt.n_bpe_tokens, cnt.doc_id % 4 AS shard,
          CAST(floor(COALESCE(SUM(cnt.n_bpe_tokens) OVER (
            PARTITION BY cnt.doc_id % 4 ORDER BY cnt.doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)
            AS BIGINT) AS bin
        FROM cnt JOIN dd USING (doc_id) ORDER BY doc_id""")),

    // NOTE: constants referenced from BOTH a query lambda and an oracle
    // string must be declared ABOVE this list — the oracle interpolation
    // runs at object init, and a val declared below the list would still
    // be 0 at that point (the x59 thresholds hit exactly this).

    // ---- WITHIN-doc repetition signals: the Gopher repetition-filter
    //      axis (duplicate/top n-gram fractions) that x28's cascade does
    //      not cover — per-row array math, zero shuffle ------------------
    Q("x59_repetition_signals",
      (s, dir) => {
        // native one-pass expression (TextFunctionsSpec proves it equals
        // the staged dupNgramRatio/topNgramShare HOF chain): the HOF
        // top-share is O(distinct × total) interpreted per row
        t(s, dir, "documents")
          .withColumn("sig",
            graft.expressions.TextExpressions.repetitionSignals(col("text")))
          .select(col("doc_id"),
            element_at(col("sig"), 1).as("dup2"),
            element_at(col("sig"), 2).as("dup3"),
            element_at(col("sig"), 3).as("top2"))
          .withColumn("keep",
            (col("dup2") <= dup2Max && col("dup3") <= dup3Max &&
              col("top2") <= top2Max).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH x AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        g AS (SELECT doc_id,
          list_transform(range(len(ts)-1), i -> ts[i+1]||'_'||ts[i+2]) AS bg,
          list_transform(range(len(ts)-2), i -> ts[i+1]||'_'||ts[i+2]||'_'||ts[i+3]) AS tg
        FROM x),
        f AS (SELECT doc_id,
          CASE WHEN len(bg)>0 THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)/len(bg) ELSE 0.0 END AS dup2,
          CASE WHEN len(tg)>0 THEN 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE)/len(tg) ELSE 0.0 END AS dup3,
          CASE WHEN len(bg)>0 THEN CAST(list_max(list_transform(list_distinct(bg), u -> len(list_filter(bg, v -> v = u)))) AS DOUBLE)/len(bg) ELSE 0.0 END AS top2
        FROM g)
      SELECT doc_id, dup2, dup3, top2,
        CAST(dup2 <= $dup2Max AND dup3 <= $dup3Max AND top2 <= $top2Max AS BIGINT) AS keep
      FROM f ORDER BY doc_id""")),

    // ---- CROSS-source overlap matrix: per-pair shared-shingle counts +
    //      Jaccard — the corpus-level leakage/diversity report (which
    //      sources are near-copies of each other) ------------------------
    Q("x60_source_overlap",
      (s, dir) => graft.operators.SourceOverlap
        .overlapMatrix(t(s, dir, "documents"), "source", "text", n = 4)
        .orderBy(col("src_a"), col("src_b")),
      Some(s"""WITH p AS (SELECT DISTINCT source, unnest($shingleSql) AS sh
          FROM documents),
        tot AS (SELECT source, count(*) AS n_sh FROM p GROUP BY source),
        pr AS (SELECT a.source AS src_a, b.source AS src_b
               FROM p a JOIN p b ON a.sh = b.sh AND a.source < b.source),
        c AS (SELECT src_a, src_b, count(*) AS shared FROM pr GROUP BY 1, 2)
      SELECT c.src_a, c.src_b, c.shared, ta.n_sh AS n_a, tb.n_sh AS n_b,
        CAST(c.shared AS DOUBLE)/(ta.n_sh + tb.n_sh - c.shared) AS jaccard
      FROM c JOIN tot ta ON c.src_a = ta.source
             JOIN tot tb ON c.src_b = tb.source
      ORDER BY src_a, src_b""")),

    // ---- PRODUCT quantization (Jégou TPAMI 2011): per-subspace
    //      codebooks → m-code compression (64 float32 dims → 16 bits).
    //      Self-adjudicating like x14: the oracle cannot retrain Lloyd's,
    //      so the query emits decimal-exact verdicts — mean reconstruction
    //      cosine ≥ 0.45 (measured ~0.48-0.53 across SFs on this corpus;
    //      random-code reconstruction is ~0) and code diversity beyond
    //      one subspace's capacity — that the oracle asserts -------------
    Q("x61_pq_codebooks",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val cbs = graft.operators.Pq.trainCodebooks(
          e, "vec_id", "embedding", dim = 64, m = 4, ksub = 16, iters = 5)
        graft.operators.Pq.encodeReconstruct(e, "vec_id", "embedding", cbs)
          .agg(count(lit(1)).as("n_vectors"),
            (sum(col("recon_cos").cast(DecimalType(14, 4))) >=
              lit(BigDecimal("0.45")) * count(lit(1))).as("recon_ok"),
            (countDistinct(concat_ws(",", col("code"))) > 16)
              .as("codes_diverse_ok"))
          .withColumn("code_bits", lit(16L))
      },
      Some("""SELECT count(*) AS n_vectors, true AS recon_ok,
        true AS codes_diverse_ok, CAST(16 AS BIGINT) AS code_bits
        FROM embeddings""")),

    // ---- IVF-PQ: the production vector-index shape (FAISS IVFPQ) —
    //      coarse cells + PQ on RESIDUALS, searched by running the IVF
    //      scan over reconstructions (numerically = the ADC trick), then
    //      REFINED: the top-25 ADC candidates per query are re-scored
    //      with exact cosine over the true vectors (FAISS
    //      IndexRefineFlat) and the top-5 kept — the standard recall
    //      recovery, one candidate-volume id join, never corpus².
    //      Self-adjudicates recall@5 vs the exact baseline like x14;
    //      the refined floor is 0.7 (m=16, ksub=128: 112-bit codes, 18x
    //      compression). NOTE this corpus-fixture config scans ~70% of
    //      cells — an artifact of the near-isotropic synthetic
    //      embeddings, NOT the production shape: x203 runs the same
    //      chain on a planted-clusters fixture at a ≤10% oracle-
    //      enforced scan budget (nlist=32, nProbe=1) and is the
    //      configuration law for real corpora (BASELINE.md r13).
    //      SCALE SHAPE (round-15, the x203 pattern): recall adjudicated
    //      over the deterministic size-bounded query panel (1-in-10 at
    //      driver SFs, ~200 capped), nlist ∝ corpus with the probed
    //      FRACTION held at 70% (nProbe = 0.7·nlist) — the ADC
    //      candidate join and both adjudication legs are panel-sized,
    //      PQ training is the one linear corpus pass -------------------
    Q("x62_ivf_pq_ann",
      (s, dir) => {
        import graft.operators.{Pq, Similarity}
        // cached: the corpus feeds training, the ADC scan, the refine
        // and the exact baseline; recon's codebook-literal expression
        // is expensive to re-evaluate per leg (the x203 lesson)
        val e = t(s, dir, "embeddings").persist()
        val n = e.count()
        // ivfScaleParams (shared with x14, ADVICE r15 item 3): the r15
        // code trained k-means on the FULL corpus at k = n/1000 —
        // trainKMeans scans its input per iteration and kppSeeds once
        // per seed, so that is n·nlist work; the bounded nlist-scaled
        // sample keeps it (20·nlist)·nlist. trainMod = 1 at every
        // driver SF (n ≤ 2000 < trainTarget), so the registered
        // behavior there is unchanged.
        val (panelMod, nlist, trainMod) = ivfScaleParams(n)
        val nProbe = math.max(7, 7 * nlist / 10)
        val eq = e.filter(col("vec_id") % panelMod === 0)
        val cents = Similarity.trainKMeans(
          e.filter(col("vec_id") % trainMod === 0), "vec_id", "embedding",
          k = nlist, iters = 5)
        val centSeq = cents.orderBy(col("cell")).collect()
          .map(_.getSeq[Float](1)).toIndexedSeq
        val resid = Pq.residuals(e, "embedding", centSeq)
        val cbs = Pq.trainCodebooks(resid, "vec_id", "__resid",
          dim = 64, m = 16, ksub = 128, iters = 5)
        val recon = Pq.ivfPqReconstruct(e, "vec_id", "embedding",
          centSeq, cbs).select(col("vec_id"), col("recon").as("embedding"))
          .persist()
        val candidates = Similarity.ivfTopK(recon, eq, cents, "vec_id",
          "embedding", k = 50, nProbe = nProbe)
          .select(col("query_id"), col("neighbor_id"))
        val approx = Similarity.refineTopK(candidates, e, eq, "vec_id",
          "embedding", k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val exact = Similarity.bruteForceTopKBroadcast(e, eq, "vec_id",
          "embedding", k = 5).select(col("query_id"), col("neighbor_id"))
        exact.join(approx.withColumn("hit", lit(1)),
            Seq("query_id", "neighbor_id"), "left")
          .agg(countDistinct(col("query_id")).as("n_queries"),
            (sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1))
              >= 0.7).as("recall_ok"))
          .withColumn("code_bits", lit(112L))
      },
      Some("""SELECT count(*) AS n_queries, true AS recall_ok,
        CAST(112 AS BIGINT) AS code_bits FROM embeddings
        WHERE vec_id % greatest(10, (SELECT count(*) FROM embeddings)
          // 200) = 0""")),

    // ---- MULTI-SIGNAL fused dedup: MinHash-Jaccard pairs ∪ SimHash
    //      Hamming pairs → one dup graph → star components → keep-list.
    //      The production fusion pattern: the two text signals catch
    //      complementary near-dup classes (set-overlap vs bit-profile),
    //      and a doc is dropped if EITHER links it to a smaller-id doc's
    //      component. Oracle: both pair generators' SQL verbatim,
    //      unioned, + the recursive-CTE min-label reachability ----------
    Q("x63_fused_dedup_keeplist",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val mh = Dedup.minhashLsh(docs, "doc_id", "text",
            n = 4, numHashes = 8, numBands = 4)
          .filter(col("jaccard") >= 0.2).select("doc_a", "doc_b")
        val sh = Dedup.simhashNearDups(docs, "doc_id", "text",
            radius = 3, bands = 4).select("doc_a", "doc_b")
        val pairs = mh.unionByName(sh).distinct()
        val comp = Dedup.connectedComponentsStar(pairs, "doc_a", "doc_b")
        docs.join(comp, docs("doc_id") === comp("v"), "left")
          .select(col("doc_id"),
            (col("comp").isNull || col("comp") === col("doc_id")).as("kept"))
          .orderBy(col("doc_id"))
      },
      Some {
        val sigs = (0 until 8).map(i => s"${minhashSigSql(i)} AS h$i").mkString(", ")
        val bands = (0 until 4).map(b =>
          s"SELECT doc_id, s, $b AS band, h${2 * b}||h${2 * b + 1} AS key FROM sg")
          .mkString(" UNION ALL ")
        s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents
              WHERE len(string_split(text,' ')) >= 4),
          sg AS (SELECT doc_id, s, $sigs FROM tk),
          bands AS ($bands),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bands a JOIN bands b
                     ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
          mh AS (SELECT doc_a, doc_b FROM cand
                 JOIN tk ta ON doc_a = ta.doc_id JOIN tk tb ON doc_b = tb.doc_id
                 WHERE CAST(len(list_intersect(ta.s, tb.s)) AS DOUBLE)
                   / len(list_distinct(ta.s || tb.s)) >= 0.2),
          shs AS (SELECT doc_id,
              array_to_string(list_transform(range(1, 65), j ->
                CASE WHEN list_sum(list_transform(list_distinct(string_split(text,' ')),
                       t -> CASE WHEN (((strpos('0123456789abcdef',
                            substr(md5(t), CAST((j-1)//4 + 1 AS INT), 1)) - 1)
                            >> CAST(3 - (j-1)%4 AS INT)) & 1) = 1
                         THEN 1 ELSE -1 END)) >= 0
                THEN '1' ELSE '0' END), '') AS sig
              FROM documents),
          sp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM shs a JOIN shs b ON a.doc_id < b.doc_id
                 WHERE len(list_filter(range(64),
                   i -> substr(a.sig, i + 1, 1) <> substr(b.sig, i + 1, 1))) <= 3),
          pr AS (SELECT doc_a, doc_b FROM mh UNION SELECT doc_a, doc_b FROM sp),
          edges AS (SELECT doc_a AS es, doc_b AS ed FROM pr
                    UNION SELECT doc_b, doc_a FROM pr),
          reach AS (SELECT es AS v, es AS l FROM edges
                    UNION
                    SELECT e.es, r.l FROM reach r JOIN edges e ON e.ed = r.v),
          comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v)
        SELECT d.doc_id,
          (c.component IS NULL OR c.component = d.doc_id) AS kept
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
        ORDER BY doc_id"""
      }),

    // ---- STREAMING incremental EMBEDDING dedup — completes the
    //      batch/streaming × text/embedding ledger matrix (x50/x56/x58/
    //      x64): SRP band postings, offset-log cursor, same from-scratch
    //      oracle as the batch x56 ------------------------------------
    Q("x64_streaming_embedding_ledger",
      (s, dir) => {
        import graft.engine._
        val vecs = t(s, dir, "embeddings")
        val split = vecs.agg(expr("(min(vec_id) + max(vec_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strvldg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strvldg")
        s.sql("CREATE DATABASE IF NOT EXISTS strvldg")
        s.sql("DROP TABLE IF EXISTS strvldg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("strvldg.db/ledger")))
          Materializer.deleteRecursively(p)
        vecs.filter(col("vec_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
        EventStreams.streamingEmbeddingDedupLedger(s, landing.toString,
          vecs.schema, "strvldg.ledger", ckpt.toString, "vec_id",
          "embedding", dim = 64)
        vecs.filter(col("vec_id") > split)
          .write.mode("append").parquet(landing.toString)
        EventStreams.streamingEmbeddingDedupLedger(s, landing.toString,
          vecs.schema, "strvldg.ledger", ckpt.toString, "vec_id",
          "embedding", dim = 64)
        s.table("strvldg.ledger")
          .groupBy(col("doc"))
          .agg(max(col("kept")).as("kept"))
          .withColumn("batch",
            when(col("doc") <= split, 1L).otherwise(2L))
          .select(col("doc").as("vec_id"), col("kept"), col("batch"))
          .orderBy(col("vec_id"))
      },
      Some(srpLedgerOracleSql)),

    // ---- SHARD manifest: size-balanced output sharding + the per-shard
    //      manifest a writer job emits (doc/token/byte volumes, md5
    //      content range) — the last mile before training-data files
    //      ship. Round-robin over size-desc rank = LPT-style balance ----
    Q("x65_shard_manifest",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("n_bpe", bpeishTokenCount(col("text")))
        graft.operators.Sampling
          .shardBySize(docs, "doc_id", "n_bpe", numShards = 8)
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_bpe")).as("n_tokens"),
            sum(col("n_chars")).as("n_bytes"),
            min(md5(col("text"))).as("content_min"),
            max(md5(col("text"))).as("content_max"))
          .orderBy(col("shard"))
      },
      Some("""WITH d AS (SELECT doc_id, text, n_chars,
          CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe
          FROM documents),
        r AS (SELECT *, row_number() OVER (ORDER BY n_bpe DESC, doc_id) AS rk
              FROM d)
      SELECT (rk - 1) % 8 AS shard,
        count(*) AS n_docs, CAST(sum(n_bpe) AS BIGINT) AS n_tokens,
        CAST(sum(n_chars) AS BIGINT) AS n_bytes,
        min(md5(text)) AS content_min, max(md5(text)) AS content_max
      FROM r GROUP BY 1 ORDER BY shard""")),

    // ---- REAL image-header decode (no stub in this path): documents
    //      drive deterministic dims, packImages builds spec-valid
    //      PNG/JPEG/GIF container bytes (CRC-correct IHDR, JFIF+COM+SOF0
    //      marker stream, GIF87a descriptor), decodeHeaders parses the
    //      dims back OUT OF THE BYTES map-side; every 97th doc is
    //      truncated mid-header to prove the unparseable path yields
    //      nulls, not crashes. The oracle recomputes the dims from the
    //      same generative arithmetic — a hash match proves decode∘pack
    //      is the identity on (format, width, height). -----------------
    Q("x66_image_decode",
      (s, dir) => {
        val spec = t(s, dir, "documents").select(col("doc_id"),
          element_at(typedlit(Seq("png", "jpeg", "gif")),
            (col("doc_id") % 3).cast("int") + 1).as("fmt"),
          (lit(1) + pmod(col("doc_id") * 7 + col("n_chars"), lit(1024)))
            .cast("int").as("w"),
          (lit(1) + pmod(col("doc_id") * 13 + col("n_chars") * 3, lit(768)))
            .cast("int").as("h"))
        // pre-sorted spec (the x13/x121 discipline): spreads the codec
        // map off the one-split scan AND drops the trailing orderBy's
        // double evaluation of the opaque chain
        val packed = Multimodal.packImages(s,
          spec.repartitionByRange(s.sparkContext.defaultParallelism,
              col("doc_id"))
            .sortWithinPartitions("doc_id"),
          "doc_id", "fmt", "w", "h")
          .toDF()
          .withColumn("payload", when(col("id") % 97 === 0,
            expr("substring(payload, 1, 6)")).otherwise(col("payload")))
        Multimodal.decodeHeaders(s, packed).toDF()
          .select(col("id"), col("format"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
      },
      Some("""SELECT doc_id AS id,
        CASE WHEN doc_id % 97 = 0 THEN NULL
             WHEN doc_id % 3 = 0 THEN 'png'
             WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'gif' END AS format,
        CASE WHEN doc_id % 97 = 0 THEN NULL
             ELSE 1 + (doc_id * 7 + n_chars) % 1024 END AS width,
        CASE WHEN doc_id % 97 = 0 THEN NULL
             ELSE 1 + (doc_id * 13 + n_chars * 3) % 768 END AS height
        FROM documents ORDER BY id""")),

    // ---- SEMANTIC dedup (SemDeDup, Abbas et al. 2023): k-means cells →
    //      within-cluster tau-graph → star components → keep min-id.
    //      Self-adjudicating like x61/x62 (the oracle cannot retrain
    //      Lloyd's): the query emits structural verdicts — every vector
    //      assigned (n_vectors), cells within bounds, every dropped
    //      vector has a tau-witness, no kept-kept tau-pair survives, and
    //      the pass actually dropped something on this corpus ------------
    Q("x67_semdedup",
      (s, dir) => {
        import graft.operators.{SemDedup, Similarity}
        val e = t(s, dir, "embeddings")
          .filter(size(col("embedding")) === 64)
          .select(col("vec_id"), col("embedding"))
        val cents = Similarity.trainKMeans(e, "vec_id", "embedding",
          k = 8, iters = 5)
        // assignment + pairs feed both the component rounds and the
        // verdict joins — localCheckpoint shares the one computation
        // (verdict-harness cost, not part of the production operator:
        // SemDedup.semanticDedup never materializes corpus-sized state)
        val assigned = SemDedup.assignCells(e, "embedding", cents)
          .localCheckpoint()
        val pairs = SemDedup
          .clusterPairs(assigned, "vec_id", "embedding", tau = 0.35)
          .localCheckpoint()
        val comps = Dedup.connectedComponentsStar(pairs, "id_a", "id_b")
        val dropped = comps.filter(col("v") =!= col("comp"))
          .select(col("v").as("id"), lit(true).as("is_dropped"))
        val res = assigned.select(col("vec_id").as("id"), col("cell"))
          .join(dropped, Seq("id"), "left")
          .withColumn("kept", col("is_dropped").isNull)
        val pv = pairs.select(col("id_a").as("id"))
          .union(pairs.select(col("id_b").as("id"))).distinct()
          .withColumn("has_pair", lit(true))
        val keptIds = res.filter(col("kept")).select(col("id"))
        val bothKept = pairs
          .join(keptIds.select(col("id").as("id_a")), Seq("id_a"))
          .join(keptIds.select(col("id").as("id_b")), Seq("id_b"))
          .select(explode(array(col("id_a"), col("id_b"))).as("id"))
          .distinct().withColumn("in_bad", lit(true))
        res.join(pv, Seq("id"), "left").join(bothKept, Seq("id"), "left")
          .agg(count(lit(1)).as("n_vectors"),
            (countDistinct(col("cell")) >= 1 &&
              countDistinct(col("cell")) <= 8).as("clusters_ok"),
            (sum(when(!col("kept") && col("has_pair").isNull, 1L)
              .otherwise(0L)) === 0L).as("drop_witness_ok"),
            (sum(when(col("in_bad"), 1L).otherwise(0L)) === 0L)
              .as("kept_independent_ok"),
            (sum(when(!col("kept"), 1L).otherwise(0L)) > 0L)
              .as("dedup_effective_ok"))
      },
      Some("""SELECT count(*) AS n_vectors, true AS clusters_ok,
        true AS drop_witness_ok, true AS kept_independent_ok,
        true AS dedup_effective_ok
        FROM embeddings WHERE len(embedding) = 64""")),

    // ---- PERCENTILE-calibrated quality thresholds (CCNet, Wenzek et al.
    //      LREC 2020): per-language cutoffs at fixed percentiles of each
    //      language's own signal distribution — the adaptive counterpart
    //      of x28's fixed Gopher rules. Exact percentile here (oracle:
    //      quantile_cont); approx_percentile is the same-contract
    //      100 TB path ------------------------------------------------
    Q("x68_adaptive_quality",
      (s, dir) => {
        import graft.operators.Calibration
        import graft.operators.Calibration.Rule
        Calibration.calibratedKeep(
          t(s, dir, "documents")
            .select(col("doc_id"), col("lang"), tokens(col("text")).as("__toks")),
          "lang",
          Seq(
            Rule("n_tokens", nTokens(col("__toks")), 0.10,
              keepAtOrAbove = true),
            Rule("dup_ratio", round(dupTokenRatio(col("__toks")), 6), 0.90,
              keepAtOrAbove = false)))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            round(col("dup_ratio"), 4).as("dup_ratio"),
            round(col("n_tokens_th"), 4).as("len_th"),
            round(col("dup_ratio_th"), 4).as("dup_th"),
            col("keep_n_tokens").as("keep_len"),
            col("keep_dup_ratio").as("keep_dup"),
            col("keep"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH x AS (SELECT doc_id, lang, string_split(text,' ') AS ts
          FROM documents),
        s AS (SELECT doc_id, lang, CAST(len(ts) AS BIGINT) AS n_tokens,
          round(CASE WHEN len(ts) > 0
            THEN 1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)/len(ts)
            ELSE 0.0 END, 6) AS dup_ratio FROM x),
        th AS (SELECT lang, quantile_cont(n_tokens, 0.10) AS len_th,
          quantile_cont(dup_ratio, 0.90) AS dup_th FROM s GROUP BY lang)
      SELECT s.doc_id, s.lang, s.n_tokens, round(s.dup_ratio, 4) AS dup_ratio,
        round(th.len_th, 4) AS len_th, round(th.dup_th, 4) AS dup_th,
        CAST(round(CAST(s.n_tokens AS DOUBLE), 4) >= round(th.len_th, 4) AS BIGINT) AS keep_len,
        CAST(round(s.dup_ratio, 4) <= round(th.dup_th, 4) AS BIGINT) AS keep_dup,
        CAST(round(CAST(s.n_tokens AS DOUBLE), 4) >= round(th.len_th, 4)
         AND round(s.dup_ratio, 4) <= round(th.dup_th, 4) AS BIGINT) AS keep
      FROM s JOIN th USING (lang) ORDER BY doc_id""")),

    // ---- CONTAMINATION report: the audit-side complement of x33 — per
    //      benchmark doc, how many of its n-grams and how many distinct
    //      corpus docs leak it (src0 plays the eval set) ----------------
    Q("x69_contamination_report",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.contaminationReport(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 4)
          .orderBy(col("bench_id"))
      },
      Some(s"""WITH b AS (SELECT doc_id AS bench_id, $shingleSql AS s
          FROM documents WHERE source = 'src0'),
        bp AS (SELECT bench_id, unnest(s) AS sh FROM b),
        cp AS (SELECT DISTINCT doc_id, sh FROM
          (SELECT doc_id, unnest($shingleSql) AS sh FROM documents
           WHERE source <> 'src0')),
        agg AS (SELECT bench_id, count(DISTINCT doc_id) AS n_hit_docs,
            count(DISTINCT sh) AS n_hit_shingles
          FROM bp JOIN cp USING (sh) GROUP BY bench_id)
      SELECT b.bench_id, CAST(len(b.s) AS BIGINT) AS n_sh,
        coalesce(agg.n_hit_shingles, 0) AS n_hit_shingles,
        coalesce(agg.n_hit_docs, 0) AS n_hit_docs
      FROM b LEFT JOIN agg USING (bench_id) ORDER BY bench_id""")),

    // ---- CARDINALITY report: per-source distinct docs + distinct
    //      shingles, exact (oracle-checked) alongside the HLL++ sketch
    //      that self-adjudicates against it — the 100 TB report path
    //      where exact distinct is a full posting shuffle ---------------
    Q("x70_cardinality_sketch",
      (s, dir) => graft.operators.Cardinality.shingleCardinality(
          t(s, dir, "documents"), "source", "doc_id", "text", n = 4)
        .orderBy(col("source")),
      Some(s"""WITH p AS (SELECT source, doc_id, unnest($shingleSql) AS sh
          FROM documents)
        SELECT source, count(DISTINCT doc_id) AS n_docs,
          count(DISTINCT sh) AS n_shingles, true AS sketch_ok
        FROM p GROUP BY source ORDER BY source""")),

    // ---- HEAVY HITTERS: exact top terms self-adjudicated against the
    //      bounded-state Misra-Gries sketch (x70's pattern for frequent
    //      items). The driver testdata is uniform by construction, so the
    //      query synthesizes a deterministic Zipf-ish key from event_id:
    //      even ids map to exponential-sized 'h<bucket>' buckets
    //      (floor(log2) via length(bin(..))-1 — integer-exact in both
    //      engines), odd ids are a unique 't<id>' tail that forces the
    //      sketch to evict constantly (tail vocab >> capacity) ----------
    Q("x71_heavy_hitters",
      (s, dir) => graft.operators.HeavyHitters.report(
        t(s, dir, "events").select(zipfTerm.as("term")),
        "term", capacity = 128, topK = 8),
      Some(heavyHittersOracleSql)),

    // ---- STREAMING heavy-hitters sketch LEDGER: x58's two-AvailableNow-
    //      run shape over per-batch Misra-Gries summaries. Run 1 sketches
    //      the first half of events, run 2 ONLY the appended half — the
    //      offset log is the cursor, history is never re-read. The global
    //      summary is groupBy-sum over the appended summary rows (MG
    //      merge = pointwise sum), and the x71 verdicts hold across
    //      increments because the bounds telescope. Same oracle as x71 —
    //      one semantics for both sketch paths (the x50/x58 precedent) --
    Q("x72_streaming_heavy_hitters",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), zipfTerm.as("term"))
        val split = ev.agg(expr("(min(event_id) + max(event_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strhh_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strhh")
        s.sql("CREATE DATABASE IF NOT EXISTS strhh")
        s.sql("DROP TABLE IF EXISTS strhh.sketch")
        for (p <- Seq(landing, ckpt, wh.resolve("strhh.db/sketch")))
          Materializer.deleteRecursively(p)
        ev.filter(col("event_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
        EventStreams.streamingHeavyHitters(s, landing.toString, ev.schema,
          "strhh.sketch", ckpt.toString, "term", capacity = 128)
        ev.filter(col("event_id") > split)
          .write.mode("append").parquet(landing.toString)
        EventStreams.streamingHeavyHitters(s, landing.toString, ev.schema,
          "strhh.sketch", ckpt.toString, "term", capacity = 128)
        // mergeSketchLedger, not a bare groupBy-sum: collapses
        // at-least-once replays on batch_id before summing
        val (summary, totals) =
          EventStreams.mergeSketchLedger(s.table("strhh.sketch"))
        graft.operators.HeavyHitters.reportFromSummary(
          ev, "term", summary, totals, capacity = 128, topK = 8)
      },
      Some(heavyHittersOracleSql)),

    // ---- QUANTILE sketch: per-source doc-length percentiles, the exact
    //      interpolated value (oracle-checked, q40's convention) next to
    //      the Greenwald-Khanna `percentile_approx` sketch, which
    //      self-adjudicates in-query (completing the sketch trio with
    //      x70 HLL cardinality and x71 MG frequency). GK guarantees the
    //      returned DATA VALUE has some rank within eps*n of the target
    //      (eps = 1/accuracy); because the value may be duplicated, the
    //      verdict checks the value's rank RANGE [count(<v)+1, count(<=v)]
    //      intersects the eps-window — integer-exact, no float ranks ----
    Q("x73_quantile_sketch",
      (s, dir) => {
        val acc = 100
        val docs = t(s, dir, "documents")
        val agged = docs.groupBy(col("source")).agg(
          count(lit(1)).as("n"),
          round(percentile(col("n_chars"), lit(0.5)), 4).as("p50_exact"),
          round(percentile(col("n_chars"), lit(0.9)), 4).as("p90_exact"),
          percentile_approx(col("n_chars"), lit(0.5), lit(acc)).as("__a50"),
          percentile_approx(col("n_chars"), lit(0.9), lit(acc)).as("__a90"))
        // rank check scan: the approx VALUES are sketch output (not
        // oracle-reproducible), so they feed verdicts only
        def within(lo: org.apache.spark.sql.Column,
            hi: org.apache.spark.sql.Column, p: Double) = {
          val slack = col("n") * lit(p * acc).cast("long") // p*n*acc
          // rank window in acc-ths: [p*n*acc - n*1, p*n*acc + n*1] vs
          // value range [lo+1, hi] scaled by acc — all integer math
          (lo * acc < slack + col("n") + acc) &&
            (hi * acc >= slack - col("n"))
        }
        docs.join(broadcast(agged), "source")
          .groupBy(col("source"))
          .agg(
            first(col("n")).as("n"),
            first(col("p50_exact")).as("p50_exact"),
            first(col("p90_exact")).as("p90_exact"),
            sum(when(col("n_chars") < col("__a50"), 1L).otherwise(0L)).as("__lo50"),
            sum(when(col("n_chars") <= col("__a50"), 1L).otherwise(0L)).as("__hi50"),
            sum(when(col("n_chars") < col("__a90"), 1L).otherwise(0L)).as("__lo90"),
            sum(when(col("n_chars") <= col("__a90"), 1L).otherwise(0L)).as("__hi90"))
          .withColumn("p50_ok", within(col("__lo50"), col("__hi50"), 0.5))
          .withColumn("p90_ok", within(col("__lo90"), col("__hi90"), 0.9))
          .select(col("source"), col("n"), col("p50_exact"),
            col("p90_exact"), col("p50_ok"), col("p90_ok"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n,
          round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS p50_exact,
          round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4) AS p90_exact,
          true AS p50_ok, true AS p90_ok
        FROM documents GROUP BY source ORDER BY source""")),

    // ---- MULTIMODAL curation end-to-end (the family's x46/x57-style
    //      capstone): build real container bytes (x66's packer, every
    //      97th truncated mid-header) → header-parse gate (unparseable
    //      dropped) → EXACT payload dedup on md5 of the bytes (payload is
    //      a pure function of (fmt,w,h), so the oracle reproduces dup
    //      groups from the dim formulas) → per-format curated manifest.
    //      bytes_kept verifies the CONTAINER sizes byte-for-byte --------
    Q("x74_multimodal_curation",
      (s, dir) => {
        val spec = t(s, dir, "documents").select(col("doc_id"),
          element_at(typedlit(Seq("png", "jpeg", "gif")),
            (col("doc_id") % 3).cast("int") + 1).as("fmt"),
          (lit(1) + pmod(col("doc_id") * 7 + col("n_chars"), lit(1024)))
            .cast("int").as("w"),
          (lit(1) + pmod(col("doc_id") * 13 + col("n_chars") * 3, lit(768)))
            .cast("int").as("h"))
        val packed = Multimodal.packImages(s, spec, "doc_id", "fmt", "w", "h")
          .toDF()
          .withColumn("payload", when(col("id") % 97 === 0,
            expr("substring(payload, 1, 6)")).otherwise(col("payload")))
        val decoded = Multimodal.decodeHeaders(s, packed).toDF()
        val keyed = decoded.filter(col("format").isNotNull)
          .join(packed.select(col("id"), col("payload")), "id")
          .withColumn("pmd5", md5(col("payload")))
          .withColumn("n_bytes", length(col("payload")).cast("long"))
        val groups = keyed.groupBy(col("format"), col("pmd5")).agg(
          count(lit(1)).as("grp_n"),
          first(col("width")).cast("long").as("w"),
          first(col("height")).cast("long").as("h"),
          first(col("n_bytes")).as("n_bytes"))
        groups.groupBy(col("format")).agg(
          sum(col("grp_n")).as("n_parseable"),
          count(lit(1)).as("n_kept"),
          (sum(col("grp_n")) - count(lit(1))).as("n_dropped_dup"),
          sum(col("w")).as("sum_w_kept"),
          sum(col("h")).as("sum_h_kept"),
          sum(col("n_bytes")).as("bytes_kept"))
          .orderBy(col("format"))
      },
      Some("""WITH spec AS (SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'png'
               WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'gif' END AS fmt,
          1 + (doc_id * 7 + n_chars) % 1024 AS w,
          1 + (doc_id * 13 + n_chars * 3) % 768 AS h
        FROM documents WHERE doc_id % 97 <> 0),
      k AS (SELECT fmt, w, h, count(*) AS grp_n
        FROM spec GROUP BY fmt, w, h)
      SELECT fmt AS format,
        CAST(sum(grp_n) AS BIGINT) AS n_parseable,
        CAST(count(*) AS BIGINT) AS n_kept,
        CAST(sum(grp_n) - count(*) AS BIGINT) AS n_dropped_dup,
        CAST(sum(w) AS BIGINT) AS sum_w_kept,
        CAST(sum(h) AS BIGINT) AS sum_h_kept,
        CAST(count(*) * CASE fmt WHEN 'png' THEN 45 WHEN 'jpeg' THEN 44
          ELSE 14 END AS BIGINT) AS bytes_kept
      FROM k GROUP BY fmt ORDER BY format""")),

    // ---- BLOOM-gated decontamination: x33's semantics when the bench
    //      set is TOO BIG to broadcast exactly — a driver-held Bloom over
    //      bench shingles prunes the corpus stream map-side; the exact
    //      join on survivors removes the fpp sliver. No false negatives,
    //      so the oracle is x33's exact SQL on this split verbatim ------
    Q("x75_decontaminate_bloom",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(col("doc_id") % 10 === 0)
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        Dedup.decontaminateBloom(corpus, bench, "doc_id", "text", n = 8,
          expectedShingles = 300000L, fpp = 0.01)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH bench AS (
          SELECT DISTINCT unnest(${shingleSqlN(8)}) AS sh
          FROM documents WHERE doc_id % 10 = 0),
        corp AS (
          SELECT doc_id, unnest(${shingleSqlN(8)}) AS sh
          FROM documents WHERE doc_id % 10 <> 0),
        bad AS (SELECT DISTINCT doc_id FROM corp JOIN bench USING (sh))
        SELECT d.doc_id, d.source FROM documents d
        WHERE d.doc_id % 10 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM bad)
        ORDER BY doc_id""")),

    // ---- DSIR importance resampling (Xie et al. NeurIPS'23): hashed
    //      unigram+bigram bucket distributions for target (lang='en')
    //      vs raw corpus; per-doc decimal-exact log importance weight;
    //      top-100 non-target docs resampled via TakeOrdered. The
    //      bucket log-ratio table is B-row broadcast; totals ride the
    //      x25/x40 single-row broadcast shape -------------------------
    Q("x76_dsir_resample",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val scores = graft.operators.Dsir.importanceScores(
          docs, "doc_id", "text", isTarget = col("lang") === "en",
          buckets = 256)
        graft.operators.Dsir.resampleTopK(scores, k = 100)
          .orderBy(col("doc_id"))
      },
      Some("""WITH sp AS (SELECT doc_id, lang = 'en' AS is_target,
          string_split(text,' ') AS ts FROM documents),
        f AS (SELECT doc_id, is_target,
          unnest(list_concat(ts, list_transform(range(len(ts)-1),
            i -> ts[i+1]||'_'||ts[i+2]))) AS f FROM sp),
        fb AS (SELECT doc_id, is_target,
          ('0x'||substr(md5(f),1,8))::BIGINT % 256 AS bucket FROM f),
        st AS (SELECT bucket, count(*) AS cr,
          sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct
          FROM fb GROUP BY bucket),
        tt AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM st),
        lr AS (SELECT bucket,
          CAST(round(ln((ct+1.0)/(tt+256)) - ln((cr+1.0)/(tr+256)), 6)
            AS DECIMAL(18,6)) AS lr FROM st, tt),
        sc AS (SELECT doc_id, is_target, count(*) AS n_feats,
          round(CAST(sum(lr) AS DOUBLE), 6) AS logw
          FROM fb JOIN lr USING (bucket) GROUP BY doc_id, is_target),
        top AS (SELECT doc_id, n_feats, logw FROM sc WHERE NOT is_target
          ORDER BY logw DESC, doc_id LIMIT 100)
        SELECT doc_id, n_feats, logw FROM top ORDER BY doc_id""")),

    // ---- LEAKAGE-SAFE train/holdout split: the x22 hash split keyed on
    //      the x19 near-dup COMPONENT instead of the doc id, so near-
    //      duplicates never straddle splits (Lee et al. ACL'22 §6.2's
    //      train-test overlap failure mode). Same CC oracle as x19 with
    //      the split CASE on the component label ------------------------
    Q("x77_leakage_safe_split",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
          maxRounds = 60)
        graft.operators.Sampling.leakageSafeSplit(docs, "doc_id", comp)
          .select(col("doc_id"), col("component"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e.s, r.l FROM reach r JOIN edges e ON e.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v)
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
          CASE WHEN substr(md5(CAST(coalesce(c.component, d.doc_id)
                 AS VARCHAR)),1,2) < 'cd'
               THEN 'train' ELSE 'holdout' END AS split
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.v
        ORDER BY doc_id""")),

    // ---- per-source distribution drift: JS divergence between each
    //      source's token distribution and the corpus distribution over
    //      the global top-64 terms + OOV (Lin 1991). Full source×bucket
    //      support grid — a source that never emits a top-K term still
    //      owes its q-side mass; contributions decimal-summed ----------
    Q("x78_source_js_drift",
      (s, dir) => graft.operators.CorpusDrift.jsDivergencePerSource(
        t(s, dir, "documents"), "source", "text", k = 64)
        .orderBy(col("source")),
      Some("""WITH tk AS (SELECT source, unnest(string_split(text,' ')) AS term
          FROM documents),
        gc AS (SELECT term, count(*) AS cg FROM tk GROUP BY term),
        vocab AS (SELECT term FROM gc ORDER BY cg DESC, term LIMIT 64),
        b AS (SELECT source, CASE WHEN term IN (SELECT term FROM vocab)
          THEN term ELSE '__oov__' END AS bterm FROM tk),
        ps AS (SELECT source, bterm, count(*) AS cs FROM b
          GROUP BY source, bterm),
        so AS (SELECT source, sum(cs) AS ns FROM ps GROUP BY source),
        c AS (SELECT bterm, sum(cs) AS cq FROM ps GROUP BY bterm),
        n AS (SELECT sum(cq) AS nq FROM c),
        g AS (SELECT so.source, so.ns, c.bterm, c.cq, n.nq,
            coalesce(ps.cs, 0) AS cs
          FROM so CROSS JOIN c CROSS JOIN n
          LEFT JOIN ps ON ps.source = so.source AND ps.bterm = c.bterm),
        j AS (SELECT source, cs, CAST(round((CASE WHEN cs > 0
            THEN (cs*1.0/ns) * ln((cs*1.0/ns) /
              (((cs*1.0/ns)+(cq*1.0/nq))/2)) ELSE 0 END
            + (cq*1.0/nq) * ln((cq*1.0/nq) /
              (((cs*1.0/ns)+(cq*1.0/nq))/2))) / 2, 8)
            AS DECIMAL(18,8)) AS contrib FROM g)
        SELECT source, CAST(sum(cs) AS BIGINT) AS n_tokens,
          CAST(round(sum(contrib), 6) AS DOUBLE) AS js
        FROM j GROUP BY source ORDER BY source""")),

    // ---- main-content extraction (jusText/C4 block-length heuristic):
    //      each doc wrapped in deterministic HTML chrome (title, nav,
    //      ads, footer), then tag-strip + block split + short-block
    //      drop must recover EXACTLY the original text (roundtrip_ok
    //      hash-checked per row). Zero-shuffle Column composition ------
    Q("x79_boilerplate_strip",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val html = concat(
          lit("<html><head><title>doc "), col("doc_id").cast("string"),
          lit("</title></head><body>\n<nav>home about contact login</nav>\n<p>"),
          col("text"),
          lit("</p>\n<div class=\"ads\">buy now best deals</div>\n<footer>copyright 2024 "),
          col("source"), lit("</footer>\n</body></html>"))
        graft.operators.Boilerplate.extractMainContent(
            docs.withColumn("html", html), "html", minWords = 5)
          .select(col("doc_id"), col("clean_text"),
            col("n_blocks_kept"), col("n_blocks_dropped"),
            (col("clean_text") === col("text")).as("roundtrip_ok"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id, text,
          '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
          '</title></head><body>' || chr(10) ||
          '<nav>home about contact login</nav>' || chr(10) ||
          '<p>' || text || '</p>' || chr(10) ||
          '<div class="ads">buy now best deals</div>' || chr(10) ||
          '<footer>copyright 2024 ' || source || '</footer>' || chr(10) ||
          '</body></html>' AS html FROM documents),
        b AS (SELECT doc_id, text, list_filter(list_transform(
            string_split(regexp_replace(html, '<[^>]*>', ' ', 'g'), chr(10)),
            l -> trim(regexp_replace(l, ' +', ' ', 'g'))),
          l -> l <> '') AS bs FROM h),
        k AS (SELECT doc_id, text, bs,
          list_filter(bs, x -> len(string_split(x, ' ')) >= 5) AS kept
          FROM b)
        SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
          CAST(len(kept) AS BIGINT) AS n_blocks_kept,
          CAST(len(bs) - len(kept) AS BIGINT) AS n_blocks_dropped,
          array_to_string(kept, ' ') = text AS roundtrip_ok
        FROM k ORDER BY doc_id""")),

    // ---- compression-ratio quality signal (Gopher repetition family in
    //      one scalar): native DEFLATE pass per doc, zero shuffles. The
    //      raw compressed count is zlib-impl-specific, so the oracle
    //      checks n_bytes exactly and the two INEQUALITY verdicts
    //      (repetition gain, stored-block sanity bound) — the x62/x67
    //      self-adjudication pattern -----------------------------------
    Q("x80_compression_signal",
      (s, dir) => graft.operators.CompressionSignal.compressionSignals(
        t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_bytes"),
          col("repeat_gain_ok"), col("ratio_sane"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          true AS repeat_gain_ok, true AS ratio_sane
        FROM documents ORDER BY doc_id""")),

    // ---- Okapi BM25 retrieval (Robertson & Walker SIGIR'94, Lucene
    //      idf): rank the corpus against a fixed query term set. Only
    //      query-term occurrences shuffle (map-side isin filter); stats
    //      broadcast; top-20 via TakeOrdered. Contributions decimal-
    //      summed; identical arithmetic grouping on both engines --------
    Q("x81_bm25_topk",
      (s, dir) => graft.operators.Bm25.topDocs(t(s, dir, "documents"),
        "doc_id", "text",
        queryTerms = Seq("spark", "window", "hash", "join", "stream"),
        topK = 20)
        .orderBy(col("doc_id")),
      Some("""WITH q AS (SELECT unnest(['spark','window','hash','join','stream']) AS term),
        dl AS (SELECT doc_id, len(string_split(text,' ')) AS dl FROM documents),
        st AS (SELECT count(*) AS n, sum(dl)*1.0/count(*) AS avgdl FROM dl),
        tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
          JOIN q USING (term) GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
          GROUP BY term),
        sc AS (SELECT tf.doc_id, CAST(round(
            ln((st.n - df.df + 0.5)/(df.df + 0.5) + 1) *
            ((tf.tf * (1.2+1)) /
             (tf.tf + 1.2 * (1 - 0.75 + 0.75*dl.dl/st.avgdl))), 6)
            AS DECIMAL(18,6)) AS c
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
          CROSS JOIN st),
        agg AS (SELECT doc_id, count(*) AS n_hit_terms,
          CAST(round(sum(c), 4) AS DOUBLE) AS score
          FROM sc GROUP BY doc_id),
        top AS (SELECT * FROM agg ORDER BY score DESC, doc_id LIMIT 20)
        SELECT doc_id, n_hit_terms, score FROM top ORDER BY doc_id""")),

    // ---- Unicode canonicalization (UAX #15): NFC-normalize + accent
    //      strip over a fixture that injects the SAME grapheme composed
    //      (doc_id%3=0: U+00E1) and decomposed (%3=1: 'a'+U+0301) —
    //      normalization must converge both to one spelling and the
    //      accent fold must recover the original ASCII text exactly.
    //      Both engines implement the same standard, so every output
    //      column is exact-checked (no verdict-only columns) -----------
    Q("x82_unicode_normalize",
      (s, dir) => {
        import graft.expressions.TextExpressions.{normalizeText, stripAccents}
        val m3 = col("doc_id") % 3
        val raw = when(m3 === 0, translate(col("text"), "a", "á"))
          .when(m3 === 1, regexp_replace(col("text"), "a", "a\u0301"))
          .otherwise(col("text"))
        val norm = normalizeText(raw, "NFC")
        val ascii = stripAccents(norm)
        t(s, dir, "documents")
          .select(col("doc_id"), norm.as("norm_text"),
            ascii.as("ascii_text"),
            length(raw).cast("long").as("raw_chars"),
            length(norm).cast("long").as("norm_chars"),
            (ascii === col("text")).as("roundtrip_ok"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH f AS (SELECT doc_id, text,
          CASE WHEN doc_id % 3 = 0 THEN replace(text, 'a', chr(225))
               WHEN doc_id % 3 = 1 THEN replace(text, 'a', 'a' || chr(769))
               ELSE text END AS raw FROM documents)
        SELECT doc_id, nfc_normalize(raw) AS norm_text,
          strip_accents(nfc_normalize(raw)) AS ascii_text,
          CAST(length(raw) AS BIGINT) AS raw_chars,
          CAST(length(nfc_normalize(raw)) AS BIGINT) AS norm_chars,
          strip_accents(nfc_normalize(raw)) = text AS roundtrip_ok
        FROM f ORDER BY doc_id""")),

    // ---- label-noise candidates: bottom-5 cosine-to-own-class-centroid
    //      per label (nearest-centroid outlier screen). Centroids are
    //      decimal-exact means of 4dp-rounded components (labels×dim
    //      rows cross the shuffle); the bottom-k is TWO-PHASE salted —
    //      with 10 labels a plain per-label window would funnel 10% of
    //      a 100 TB corpus through one task --------------------------
    Q("x83_label_outliers",
      (s, dir) => graft.operators.LabelNoise.labelOutliers(
        t(s, dir, "embeddings").filter(size(col("embedding")) === 64),
        "vec_id", "label", "embedding", k = 5)
        .orderBy(col("label"), col("rank")),
      Some("""WITH pe AS (SELECT label, r.range AS pos,
          CAST(round(CAST(embedding[r.range+1] AS DOUBLE), 4)
            AS DECIMAL(18,4)) AS comp
          FROM embeddings, range(64) r WHERE len(embedding) = 64),
        ct AS (SELECT label, pos,
          floor((CAST(sum(comp) AS DOUBLE)/count(*)) * 1000000 + 0.5)
            / 1000000 AS c
          FROM pe GROUP BY label, pos),
        ca AS (SELECT label, list(c ORDER BY pos) AS centroid
          FROM ct GROUP BY label),
        sc AS (SELECT e.label, e.vec_id,
          round(list_sum(list_transform(range(64),
              i -> CAST(e.embedding[i+1] AS DOUBLE)*ca.centroid[i+1]))
            / (sqrt(list_sum(list_transform(range(64),
                i -> CAST(e.embedding[i+1] AS DOUBLE)
                   * CAST(e.embedding[i+1] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(64),
                i -> ca.centroid[i+1]*ca.centroid[i+1])))), 4) AS cos
          FROM embeddings e JOIN ca USING (label)
          WHERE len(e.embedding) = 64),
        rk AS (SELECT *, row_number() OVER (PARTITION BY label
          ORDER BY cos, vec_id) AS rank FROM sc)
        SELECT label, CAST(rank AS BIGINT) AS rank, vec_id, cos
        FROM rk WHERE rank <= 5 ORDER BY label, rank""")),

    // ---- STREAMING source-drift monitor: x78's JS drift as an
    //      incremental ledger. The vocabulary is PINNED from a reference
    //      sample (doc_id%10=0) — a micro-batch cannot know the global
    //      top-K, and a moving vocabulary makes drift incomparable
    //      across batches. Two AvailableNow runs append additive
    //      (source, bterm) counts stamped with batch_id; the merge
    //      dedups replays then sums — counts telescope to the batch
    //      table, so the oracle is the batch SQL with the pinned vocab --
    Q("x84_streaming_source_drift",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        val vocab = graft.operators.CorpusDrift.referenceVocabulary(
          docs.filter(col("doc_id") % 10 === 0), "text", k = 64)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strdrift_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strdrift")
        s.sql("CREATE DATABASE IF NOT EXISTS strdrift")
        s.sql("DROP TABLE IF EXISTS strdrift.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("strdrift.db/ledger")))
          Materializer.deleteRecursively(p)
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        EventStreams.streamingDriftLedger(s, landing.toString, docs.schema,
          "strdrift.ledger", ckpt.toString, "source", "text", vocab)
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        EventStreams.streamingDriftLedger(s, landing.toString, docs.schema,
          "strdrift.ledger", ckpt.toString, "source", "text", vocab)
        val merged = EventStreams.mergeDriftLedger(s.table("strdrift.ledger"))
        graft.operators.CorpusDrift.jsFromBucketCounts(merged)
          .orderBy(col("source"))
      },
      Some("""WITH v AS (SELECT term FROM (
            SELECT unnest(string_split(text,' ')) AS term FROM documents
            WHERE doc_id % 10 = 0)
          GROUP BY term ORDER BY count(*) DESC, term LIMIT 64),
        tk AS (SELECT source, unnest(string_split(text,' ')) AS term
          FROM documents),
        b AS (SELECT source, CASE WHEN term IN (SELECT term FROM v)
          THEN term ELSE '__oov__' END AS bterm FROM tk),
        ps AS (SELECT source, bterm, count(*) AS cs FROM b
          GROUP BY source, bterm),
        so AS (SELECT source, sum(cs) AS ns FROM ps GROUP BY source),
        c AS (SELECT bterm, sum(cs) AS cq FROM ps GROUP BY bterm),
        n AS (SELECT sum(cq) AS nq FROM c),
        g AS (SELECT so.source, so.ns, c.bterm, c.cq, n.nq,
            coalesce(ps.cs, 0) AS cs
          FROM so CROSS JOIN c CROSS JOIN n
          LEFT JOIN ps ON ps.source = so.source AND ps.bterm = c.bterm),
        j AS (SELECT source, cs, CAST(round((CASE WHEN cs > 0
            THEN (cs*1.0/ns) * ln((cs*1.0/ns) /
              (((cs*1.0/ns)+(cq*1.0/nq))/2)) ELSE 0 END
            + (cq*1.0/nq) * ln((cq*1.0/nq) /
              (((cs*1.0/ns)+(cq*1.0/nq))/2))) / 2, 8)
            AS DECIMAL(18,8)) AS contrib FROM g)
        SELECT source, CAST(sum(cs) AS BIGINT) AS n_tokens,
          CAST(round(sum(contrib), 6) AS DOUBLE) AS js
        FROM j GROUP BY source ORDER BY source""")),

    // ---- split-leakage AUDIT: the quantified case for x77. Count
    //      near-dup pairs straddling train/holdout under (a) the naive
    //      id-keyed hash split — leaks ≈ 2p(1−p) of pairs — and (b) the
    //      component-keyed split — leaks ZERO by construction. Both
    //      numbers exact-checked; 2 rows out ---------------------------
    Q("x85_split_leakage_audit",
      (s, dir) => {
        import graft.operators.Sampling
        val docs = t(s, dir, "documents")
        // persisted: three consumers (CC + both audits) would otherwise
        // re-run the band join per consumer
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L).persist()
        val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
          maxRounds = 60)
        val ids = docs.select(col("doc_id"))
        val naive = Sampling.hashSplit(ids, "doc_id")
        val safe = Sampling.leakageSafeSplit(ids, "doc_id", comp)
          .select(col("doc_id"), col("split"))
        Sampling.splitCrossings(pairs, "doc_a", "doc_b", naive,
            "doc_id", "split", "hash_by_id")
          .unionByName(Sampling.splitCrossings(pairs, "doc_a", "doc_b",
            safe, "doc_id", "split", "hash_by_component"))
          .orderBy(col("method"))
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e.s, r.l FROM reach r JOIN edges e ON e.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v),
        naive AS (SELECT doc_id, CASE WHEN
            substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'cd'
          THEN 'train' ELSE 'holdout' END AS split FROM documents),
        safe AS (SELECT d.doc_id, CASE WHEN
            substr(md5(CAST(coalesce(c.component, d.doc_id)
              AS VARCHAR)),1,2) < 'cd'
          THEN 'train' ELSE 'holdout' END AS split
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
        a1 AS (SELECT 'hash_by_id' AS method, count(*) AS n_pairs,
          CAST(sum(CASE WHEN x.split <> y.split THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cross_split
          FROM pr JOIN naive x ON pr.doc_a = x.doc_id
                  JOIN naive y ON pr.doc_b = y.doc_id),
        a2 AS (SELECT 'hash_by_component' AS method, count(*) AS n_pairs,
          CAST(sum(CASE WHEN x.split <> y.split THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cross_split
          FROM pr JOIN safe x ON pr.doc_a = x.doc_id
                  JOIN safe y ON pr.doc_b = y.doc_id)
        SELECT method, n_pairs, n_cross_split,
          n_cross_split = 0 AS leak_free
        FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
        ORDER BY method""")),

    // ---- EXACT set-similarity join via prefix filtering (AllPairs,
    //      Bayardo WWW'07): every Jaccard >= 0.5 pair with NO recall
    //      loss — x03's LSH misses band-miss pairs, x02's maxDf prune
    //      misses frequent-shingle-only overlap; prefix filtering bounds
    //      the index by theorem (rarest-first order, |x|−⌈t|x|⌉+1
    //      prefix). The oracle is the UNPRUNED brute-force pair join —
    //      exactly the ground truth the operator claims -----------------
    Q("x86_setsim_exact_join",
      (s, dir) => graft.operators.SetSimJoin.jaccardJoinExact(
        t(s, dir, "documents"), "doc_id", "text", n = 4, threshold = 0.5)
        .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        sz AS (SELECT doc, count(*) AS n FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc)
        SELECT doc_a, doc_b,
          CAST(common AS DOUBLE)/(sa.n + sb.n - common) AS jaccard
        FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
        WHERE CAST(common AS DOUBLE)/(sa.n + sb.n - common) >= 0.5
        ORDER BY doc_a, doc_b""")),

    // ---- Count-Min point-frequency sketch (Cormode & Muthukrishnan
    //      2005): completes the sketch quartet (HLL cardinality x70,
    //      Misra-Gries heavy hitters x71/x72, GK quantiles x73) with the
    //      "how often did THIS term occur" primitive. The md5-bucket
    //      arithmetic is plain SQL, so the oracle rebuilds the ENTIRE
    //      sketch and exact-checks the estimates — not verdict-only.
    //      Same Zipf key as x71; depth 4 × width 1024 longs of state ----
    Q("x87_countmin_freq",
      (s, dir) => graft.operators.HeavyHitters.countMinReport(
        t(s, dir, "events").select(zipfTerm.as("term")),
        "term", depth = 4, width = 1024, topK = 8),
      Some(countMinOracleSql)),

    // ---- memorization-risk screen (Carlini et al. arXiv:2202.07646:
    //      memorization scales with duplicate count; Kandpal et al.
    //      ICML'22): per-doc duplication-weighted shingle exposure —
    //      the report a sampler reads BEFORE deciding effective epochs.
    //      Inverted-index shape, no pairwise term anywhere -------------
    Q("x88_memorization_risk",
      (s, dir) => graft.operators.MemorizationRisk.report(
        t(s, dir, "documents"), "doc_id", "text", n = 4, minDocs = 2L)
        .orderBy(col("doc_id")),
      Some(s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        d AS (SELECT sh, count(*) AS dfc FROM ex GROUP BY sh),
        p AS (SELECT doc, count(*) AS ns,
            sum(CASE WHEN dfc >= 2 THEN 1 ELSE 0 END) AS ne,
            max(dfc) AS mx
          FROM ex JOIN d USING (sh) GROUP BY doc)
        SELECT doc_id,
          CAST(coalesce(ns, 0) AS BIGINT) AS n_shingles,
          CAST(coalesce(ne, 0) AS BIGINT) AS n_exposed,
          CASE WHEN coalesce(ns, 0) > 0
            THEN CAST(ne AS DOUBLE) / ns ELSE 0.0 END AS exposed_frac,
          CAST(coalesce(mx, 0) AS BIGINT) AS max_df,
          CASE WHEN coalesce(ns, 0) = 0 THEN 'none'
            WHEN CAST(ne AS DOUBLE)/ns >= 0.5 THEN 'high'
            WHEN CAST(ne AS DOUBLE)/ns >= 0.1 THEN 'medium'
            WHEN ne > 0 THEN 'low' ELSE 'none' END AS risk
        FROM documents LEFT JOIN p ON doc_id = p.doc
        ORDER BY doc_id""")),

    // ---- edit-distance self-join via deletion-neighborhood blocking
    //      (FastSS; Gravano VLDB'01 family) over the distinct 12-char
    //      text-prefix key: the entity-resolution primitive the
    //      shingle-set joins can't express (character-level edits, not
    //      token overlap). Recall-complete by the common-subsequence
    //      pigeonhole; candidates verified with true levenshtein. The
    //      oracle is the brute-force distinct-key pair scan ------------
    Q("x89_editdist_join",
      (s, dir) => graft.operators.EditDistJoin.selfJoin(
        t(s, dir, "documents")
          .select(substring(col("text"), 1, 12).as("key")),
        "key", maxDist = 2)
        .orderBy(col("key_a"), col("key_b")),
      Some("""WITH k AS (SELECT DISTINCT substr(text, 1, 12) AS key
          FROM documents WHERE text IS NOT NULL)
        SELECT a.key AS key_a, b.key AS key_b,
          CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        FROM k a JOIN k b ON a.key < b.key
        WHERE abs(length(a.key) - length(b.key)) <= 2
          AND levenshtein(a.key, b.key) <= 2
        ORDER BY key_a, key_b""")),

    // ---- Maximal Marginal Relevance selection (Carbonell & Goldstein
    //      SIGIR'98): relevant-but-diverse top-k — the anti-redundancy
    //      selection rule. Corpus side distributed (cosine-to-query +
    //      TakeOrdered pool); the quadratic term confined to the bounded
    //      24-item pool; the greedy runs in EXACT decimal on both
    //      engines (scale-5 scores, id tie-break), so the oracle's
    //      recursive CTE replays the identical pick sequence -----------
    Q("x90_mmr_select",
      (s, dir) => graft.operators.Mmr.mmrSelect(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 7L, poolSize = 24, k = 8)
        .select(col("step"), col("id").as("vec_id"), col("mmr_score"))
        .orderBy(col("step")),
      Some {
        val d = dotSql.format("e.embedding", "e.embedding", "qv.embedding")
        val dab = dotSql.format("a.embedding", "a.embedding", "b.embedding")
        val nq = dotSql.format("embedding", "embedding", "embedding")
        s"""WITH RECURSIVE e AS (SELECT vec_id, embedding, sqrt($nq) AS nrm
            FROM embeddings),
          qv AS (SELECT embedding, nrm FROM e WHERE vec_id = 7),
          r AS (SELECT e.vec_id, round($d / (e.nrm * qv.nrm), 4) AS rel
            FROM e, qv),
          pool AS (SELECT vec_id, rel FROM r
            ORDER BY rel DESC, vec_id LIMIT 24),
          ps AS (SELECT a.vec_id AS pa, b.vec_id AS pb,
              round($dab / (a.nrm * b.nrm), 4) AS s
            FROM e a JOIN e b ON a.vec_id <> b.vec_id
            WHERE a.vec_id IN (SELECT vec_id FROM pool)
              AND b.vec_id IN (SELECT vec_id FROM pool)),
          sel(step, ids, picked, score) AS (
            (SELECT 1, [vec_id], vec_id, CAST(rel AS DECIMAL(14,5))
             FROM pool ORDER BY rel DESC, vec_id LIMIT 1)
            UNION ALL
            SELECT sel.step + 1, list_append(sel.ids, nxt.vec_id),
              nxt.vec_id, nxt.score
            FROM sel, LATERAL (
              SELECT p.vec_id,
                CAST(CAST(p.rel AS DECIMAL(14,4)) - 0.5 * CAST((
                  SELECT max(ps.s) FROM ps
                  WHERE ps.pa = p.vec_id AND list_contains(sel.ids, ps.pb))
                  AS DECIMAL(14,4)) AS DECIMAL(14,5)) AS score
              FROM pool p WHERE NOT list_contains(sel.ids, p.vec_id)
              ORDER BY score DESC, p.vec_id LIMIT 1) nxt
            WHERE sel.step < 8)
        SELECT CAST(step AS BIGINT) AS step, picked AS vec_id,
          CAST(score AS DOUBLE) AS mmr_score
        FROM sel ORDER BY step"""
      }),

    // ---- hybrid retrieval via Reciprocal Rank Fusion (Cormack SIGIR'09):
    //      fuse the x81 BM25 top-20 with the embedding top-20 (the two
    //      production retrieval modalities) by Σ 1/(60+rank) — no score
    //      calibration, rank-only. Ranks of the BOUNDED lists come from
    //      K×K broadcast comparison joins, never a global window;
    //      contributions are 8dp decimals so both engines sum exactly.
    //      The embeddings table shares the documents id space (driver
    //      fixture wiring), so the fused id IS the doc id --------------
    Q("x91_hybrid_rrf",
      (s, dir) => {
        import graft.operators.Rrf
        val lex = graft.operators.Bm25.topDocs(t(s, dir, "documents"),
          "doc_id", "text",
          queryTerms = Seq("spark", "window", "hash", "join", "stream"),
          topK = 20)
        val e = t(s, dir, "embeddings")
        val qVec = e.filter(col("vec_id") === 7L)
          .select(col("embedding")).first().getSeq[Float](0)
        val sem = e.select(col("vec_id").as("doc_id"),
            round(cosine(col("embedding"), typedlit(qVec)), 4).as("rel"))
          .orderBy(col("rel").desc, col("doc_id")).limit(20)
        Rrf.fuse(Seq(
            Rrf.boundedRank(lex, "doc_id", "score"),
            Rrf.boundedRank(sem, "doc_id", "rel")),
          "doc_id", k = 60, topN = 10)
          .orderBy(col("doc_id"))
      },
      Some {
        val d = dotSql.format("e.embedding", "e.embedding", "qv.embedding")
        val nq = dotSql.format("embedding", "embedding", "embedding")
        s"""WITH q AS (SELECT unnest(['spark','window','hash','join','stream']) AS term),
          dl AS (SELECT doc_id, len(string_split(text,' ')) AS dl FROM documents),
          st AS (SELECT count(*) AS n, sum(dl)*1.0/count(*) AS avgdl FROM dl),
          tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
            FROM documents),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
            JOIN q USING (term) GROUP BY doc_id, term),
          df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
            GROUP BY term),
          sc AS (SELECT tf.doc_id, CAST(round(
              ln((st.n - df.df + 0.5)/(df.df + 0.5) + 1) *
              ((tf.tf * (1.2+1)) /
               (tf.tf + 1.2 * (1 - 0.75 + 0.75*dl.dl/st.avgdl))), 6)
              AS DECIMAL(18,6)) AS c
            FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
            CROSS JOIN st),
          lexagg AS (SELECT doc_id, CAST(round(sum(c), 4) AS DOUBLE)
              AS score
            FROM sc GROUP BY doc_id),
          lextop AS (SELECT doc_id, score FROM lexagg
            ORDER BY score DESC, doc_id LIMIT 20),
          lex AS (SELECT doc_id, row_number() OVER
            (ORDER BY score DESC, doc_id) AS rank FROM lextop),
          e AS (SELECT vec_id, embedding, sqrt($nq) AS nrm FROM embeddings),
          qv AS (SELECT embedding, nrm FROM e WHERE vec_id = 7),
          relt AS (SELECT e.vec_id AS doc_id,
              round($d / (e.nrm * qv.nrm), 4) AS rel FROM e, qv),
          semtop AS (SELECT doc_id, rel FROM relt
            ORDER BY rel DESC, doc_id LIMIT 20),
          sem AS (SELECT doc_id, row_number() OVER
            (ORDER BY rel DESC, doc_id) AS rank FROM semtop),
          u AS (SELECT doc_id, CAST(round(1.0/(60+rank), 8)
                AS DECIMAL(18,8)) AS c FROM lex
            UNION ALL
            SELECT doc_id, CAST(round(1.0/(60+rank), 8)
                AS DECIMAL(18,8)) AS c FROM sem),
          f AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
              round(CAST(sum(c) AS DOUBLE), 8) AS rrf_score
            FROM u GROUP BY doc_id),
          top AS (SELECT * FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10)
        SELECT doc_id, n_lists, rrf_score FROM top ORDER BY doc_id"""
      }),

    // ---- SEMANTIC decontamination: x33/x75's embedding-space twin —
    //      drop corpus vectors with cos >= 0.9 to ANY benchmark vector
    //      (paraphrased leakage exact n-gram collision can't see).
    //      Bipartite SRP-LSH blocking at the production 8-bit-band
    //      parameterization, exact-cosine verify before any drop. The
    //      corpus unions in x39-style near-twins of every 20th benchmark
    //      vector (cos ≈ 0.97) so the drop path is actually exercised;
    //      the oracle regenerates fixture, hyperplanes, bands and verify
    //      identically ------------------------------------------------
    Q("x92_semantic_decontaminate",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val bench = e.filter(col("vec_id") % 10 === 0)
        val twins = bench.filter(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i % 16 === 0, lit(0.0f)).otherwise(x))
              .as("embedding"))
        val corpus = e.filter(col("vec_id") % 10 =!= 0).unionByName(twins)
        Dedup.semanticDecontaminate(corpus, bench, "vec_id", "embedding",
          threshold = 0.9, dim = 64, numPlanes = 128, numBands = 16)
          .select(col("vec_id"))
          .orderBy(col("vec_id"))
      },
      Some(srpDecontOracleSql(numPlanes = 128, numBands = 16,
        threshold = 0.9))),

    // ---- perceptual-hash image near-dups: aHash over REAL decoded
    //      pixels (decode → NN 8×8 luma grid → above-mean bits) +
    //      pigeonhole Hamming banding — the near-dup class byte-level
    //      signatures (x54) are blind to, exercised by +5-brightness
    //      twins whose every compressed byte differs but whose aHash is
    //      IDENTICAL. PNG noise fixtures (md5-seeded pixels) keep
    //      unrelated hashes uncorrelated — a smooth gradient fixture
    //      measured 9.9k spurious pairs vs the 50 planted. The oracle
    //      recomputes the hash from the pixel formula (lossless PNG ⇒
    //      decoded == formula) and replays banding + verify ------------
    Q("x93_perceptual_neardups",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        def dims(d: org.apache.spark.sql.DataFrame) = d.select(
          col("__id").as("id"), col("doc_id").as("pat"),
          (lit(8) + pmod(col("doc_id") * 7 + col("n_chars"), lit(57)))
            .cast("int").as("w"),
          (lit(8) + pmod(col("doc_id") * 13 + col("n_chars") * 3, lit(49)))
            .cast("int").as("h"),
          col("__cb").cast("int").as("cb"))
        val spec = dims(docs
          .withColumn("__id", col("doc_id"))
          .withColumn("__cb", pmod(col("doc_id"), lit(40))))
        val twins = dims(docs.filter(col("doc_id") % 10 === 0)
          .withColumn("__id", col("doc_id") + 1000000L)
          .withColumn("__cb", pmod(col("doc_id"), lit(40)) + 5))
        // same pre-codec rebalance as x13: encode+decode dominate, the
        // spec scan is one split
        val packed = Multimodal.packNoiseImages(s,
          spec.unionByName(twins)
            .repartition(s.sparkContext.defaultParallelism),
          "id", "pat", "w", "h", "cb").toDF()
        val hashes = Multimodal.perceptualHash(s, packed, grid = 8).toDF()
        Multimodal.perceptualNearDups(hashes, radius = 3, bands = 4)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH spec AS (
          SELECT doc_id AS id, doc_id AS pat,
            8 + (doc_id*7 + n_chars) % 57 AS w,
            8 + (doc_id*13 + n_chars*3) % 49 AS h,
            doc_id % 40 AS cb
          FROM documents
          UNION ALL
          SELECT doc_id + 1000000, doc_id,
            8 + (doc_id*7 + n_chars) % 57,
            8 + (doc_id*13 + n_chars*3) % 49,
            doc_id % 40 + 5
          FROM documents WHERE doc_id % 10 = 0),
        d AS (SELECT id, list_transform(range(64),
            i -> ('0x'||substr(md5(pat||':'||((i % 8) * w // 8)||':'||
              ((i // 8) * h // 8)),1,8))::BIGINT % 200 + cb) AS dv
          FROM spec),
        ph AS (SELECT id, array_to_string(list_transform(dv,
            v -> CASE WHEN v * 64 > list_sum(dv) THEN '1' ELSE '0' END),
            '') AS phash
          FROM d),
        bd AS (SELECT id, phash, b.range AS band,
            substr(phash, b.range * 16 + 1, 16) AS key
          FROM ph, range(4) b),
        cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b,
            x.phash AS ha, y.phash AS hb
          FROM bd x JOIN bd y
            ON x.band = y.band AND x.key = y.key AND x.id < y.id),
        pr AS (SELECT id_a, id_b, CAST(len(list_filter(range(64),
            i -> substr(ha, i+1, 1) <> substr(hb, i+1, 1))) AS BIGINT)
            AS hamming
          FROM cand)
      SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3
      ORDER BY id_a, id_b""")),

    // ---- STREAMING Count-Min sketch LEDGER: x87's point-frequency
    //      sketch as the x72-shape two-AvailableNow-run ledger — each
    //      run appends its microbatch's sparse (pos, cnt) counters +
    //      row-count sentinel, the offset log is the cursor, history is
    //      never re-read. CM counters are ADDITIVE, so the replay-
    //      deduped sum telescopes to the whole-corpus sketch and x87's
    //      oracle pins both paths to one semantics ---------------------
    Q("x94_streaming_countmin",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), zipfTerm.as("term"))
        val split = ev.agg(expr("(min(event_id) + max(event_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strcm_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strcm")
        s.sql("CREATE DATABASE IF NOT EXISTS strcm")
        s.sql("DROP TABLE IF EXISTS strcm.sketch")
        for (p <- Seq(landing, ckpt, wh.resolve("strcm.db/sketch")))
          Materializer.deleteRecursively(p)
        ev.filter(col("event_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
        EventStreams.streamingCountMin(s, landing.toString, ev.schema,
          "strcm.sketch", ckpt.toString, "term", depth = 4, width = 1024)
        ev.filter(col("event_id") > split)
          .write.mode("append").parquet(landing.toString)
        EventStreams.streamingCountMin(s, landing.toString, ev.schema,
          "strcm.sketch", ckpt.toString, "term", depth = 4, width = 1024)
        // mergeCountMinLedger, not a bare groupBy-sum: collapses
        // at-least-once replays on (batch_id, pos) before summing
        val (counters, totals) =
          EventStreams.mergeCountMinLedger(s.table("strcm.sketch"))
        graft.operators.HeavyHitters.countMinReportFromCounters(
          ev.select(col("term")), "term", counters, totals,
          depth = 4, width = 1024, topK = 8)
      },
      Some(countMinOracleSql)),

    // ---- PageRank (Brin & Page WWW'98) over a deterministic synthetic
    //      link graph (every doc links to its successor + two hashed
    //      targets — out-degree >= 1 and in-link coverage by
    //      construction, so neither engine's iteration drops nodes).
    //      Ten driver-bounded rounds, each ONE join + ONE per-dst agg;
    //      contributions are 10dp decimals so shuffle order can't flip
    //      a rounding, and the oracle's recursive CTE replays every
    //      round bit-for-bit ------------------------------------------
    Q("x95_pagerank",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"))
        val n = docs.count()
        val dsts = Seq(col("doc_id") + 1, col("doc_id") * 17 + 3,
          col("doc_id") * 31 + 7)
        val edges = dsts.map(d => docs.select(col("doc_id").as("src"),
            pmod(d, lit(n)).as("dst")))
          .reduce(_ unionByName _).distinct()
        graft.operators.PageRank.ranks(edges, "src", "dst",
          iters = 10, damping = 0.85)
          .orderBy(col("node"))
      },
      Some("""WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        edges AS (SELECT DISTINCT src, dst FROM (
          SELECT doc_id AS src,
            (doc_id+1) % (SELECT n FROM nn) AS dst FROM documents
          UNION ALL SELECT doc_id,
            (doc_id*17+3) % (SELECT n FROM nn) FROM documents
          UNION ALL SELECT doc_id,
            (doc_id*31+7) % (SELECT n FROM nn) FROM documents) u(src, dst)),
        deg AS (SELECT src, count(*) AS outd FROM edges GROUP BY src),
        pr(iter, node, rank) AS (
          SELECT 0, doc_id, round(1.0/(SELECT n FROM nn), 8)
          FROM documents
          UNION ALL
          SELECT pr.iter + 1, e.dst,
            round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                / (SELECT n FROM nn)
              + CAST(0.85 AS DOUBLE) * CAST(sum(
                CAST(round(pr.rank / deg.outd, 10) AS DECIMAL(28,10)))
                AS DOUBLE), 8)
          FROM pr JOIN edges e ON pr.node = e.src
               JOIN deg ON pr.node = deg.src
          WHERE pr.iter < 10
          GROUP BY pr.iter, e.dst)
      SELECT node, rank FROM pr WHERE iter = 10 ORDER BY node""")),

    // ---- PMI collocations (Church & Hanks, CL 1990): adjacent pairs
    //      co-occurring above chance — the tokenizer-vocabulary health
    //      report. One bigram agg + one unigram agg, totals on the
    //      single-row broadcast shape; the PMI is ONE left-associated
    //      double expression over integer counts, so the 6dp rounding
    //      is oracle-exact --------------------------------------------
    Q("x96_pmi_collocations",
      (s, dir) => graft.operators.Collocations.topPmi(
        t(s, dir, "documents"), "text", minCount = 5L, topK = 20)
        .orderBy(col("pmi").desc, col("w1"), col("w2")),
      Some("""WITH t AS (SELECT string_split(text,' ') AS ts FROM documents),
        u AS (SELECT w, count(*) AS n_w FROM
          (SELECT unnest(ts) AS w FROM t) GROUP BY w),
        nu AS (SELECT sum(n_w) AS n_uni FROM u),
        bp AS (SELECT p[1] AS w1, p[2] AS w2 FROM (SELECT unnest(
            list_transform(range(len(ts)-1), i -> [ts[i+1], ts[i+2]]))
            AS p FROM t)),
        ba AS (SELECT w1, w2, count(*) AS n_pair FROM bp GROUP BY w1, w2),
        nb AS (SELECT sum(n_pair) AS n_bi FROM ba),
        sc AS (SELECT w1, w2, n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
            round(ln((CAST(n_pair AS DOUBLE) * n_uni * n_uni) /
              (CAST(n_bi AS DOUBLE) * u1.n_w * u2.n_w)), 6) AS pmi
          FROM ba JOIN u u1 ON w1 = u1.w JOIN u u2 ON w2 = u2.w, nu, nb
          WHERE n_pair >= 5),
        top AS (SELECT * FROM sc ORDER BY pmi DESC, w1, w2 LIMIT 20)
      SELECT w1, w2, n_pair, n_w1, n_w2, pmi FROM top
      ORDER BY pmi DESC, w1, w2""")),

    // ---- KMV cross-source overlap (Beyer SIGMOD'07 / Broder '97):
    //      the sketch-cost twin of x60 — per-source bottom-256 sketches
    //      over 48-bit shingle hashes; union/Jaccard/intersection per
    //      pair from s×k longs, exact matrix attached in-row as the
    //      adjudication baseline (within_bound = |ΔJ| <= 0.1, > 3σ).
    //      Hashes are md5-derived integers, so the oracle REBUILDS the
    //      identical sketches with window SQL (the x87 discipline) ------
    Q("x97_kmv_overlap",
      (s, dir) => graft.operators.KmvOverlap.overlapEstimates(
        t(s, dir, "documents"), "source", "text", n = 4, k = 256)
        .orderBy(col("src_a"), col("src_b")),
      Some(s"""WITH hx AS (SELECT DISTINCT source,
          ('0x'||substr(md5(sh),1,12))::BIGINT AS h
        FROM (SELECT source, unnest($shingleSql) AS sh FROM documents)),
      sk AS (SELECT source, h FROM (
          SELECT source, h,
            row_number() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM hx) WHERE rn <= 256),
      srcs AS (SELECT DISTINCT source FROM hx),
      pairs AS (SELECT a.source AS sa, b.source AS sb
        FROM srcs a JOIN srcs b ON a.source < b.source),
      ud AS (SELECT p.sa, p.sb, s.h,
          max(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS in_a,
          max(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS in_b
        FROM pairs p JOIN sk s ON s.source IN (p.sa, p.sb)
        GROUP BY p.sa, p.sb, s.h),
      ub AS (SELECT *,
          row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
        FROM ud),
      agg AS (SELECT sa, sb, count(*) AS m, max(h) AS theta,
          sum(in_a * in_b) AS matches
        FROM ub WHERE rn <= 256 GROUP BY sa, sb),
      tot AS (SELECT source, count(*) AS n_sh FROM hx GROUP BY source),
      sh2 AS (SELECT a.source AS sa, b.source AS sb, count(*) AS shared
        FROM hx a JOIN hx b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2),
      est AS (SELECT sa AS src_a, sb AS src_b,
          CASE WHEN m < 256 THEN CAST(m AS DOUBLE)
               ELSE round(255.0 / (theta / 281474976710656.0), 4)
          END AS est_union,
          round(CAST(matches AS DOUBLE) / m, 6) AS est_jaccard
        FROM agg),
      fin AS (SELECT e.src_a, e.src_b, e.est_union, e.est_jaccard,
          round(e.est_jaccard * e.est_union, 4) AS est_inter,
          round(coalesce(s.shared, 0) /
            CAST(ta.n_sh + tb.n_sh - coalesce(s.shared, 0) AS DOUBLE),
            6) AS exact_jaccard
        FROM est e
        LEFT JOIN sh2 s ON s.sa = e.src_a AND s.sb = e.src_b
        JOIN tot ta ON ta.source = e.src_a
        JOIN tot tb ON tb.source = e.src_b)
      SELECT src_a, src_b, est_union, est_jaccard, est_inter,
        exact_jaccard,
        round(abs(est_jaccard - exact_jaccard), 6) AS abs_err,
        (round(abs(est_jaccard - exact_jaccard), 6) <= 0.1)
          AS within_bound
      FROM fin ORDER BY src_a, src_b""")),

    // ---- UniMax budget allocation (Chung et al. ICLR'23): water-fill a
    //      token budget across languages smallest-first with an epoch
    //      cap — the bounded-repetition alternative to temperature
    //      sampling (x48/x57). lang is the skewed grouping in this
    //      corpus (en ≈ 3.3x de), so at budget = ⌊9T/10⌋, cap = 1 epoch
    //      the four small langs cap at exactly 1.0 and en takes the
    //      redistributed remainder — both branches exercised. Integer
    //      shares (⌊U/remaining⌋), so the recursive-CTE oracle replays
    //      the driver loop exactly ------------------------------------
    Q("x98_unimax_mix",
      (s, dir) => graft.operators.Unimax.allocateFraction(s,
        t(s, dir, "documents"), "lang", "text",
        budgetNum = 9L, budgetDen = 10L, epochCap = 1)
        .orderBy(col("source")),
      Some("""WITH RECURSIVE c AS (SELECT lang AS source,
          CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n
        FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS t, count(*) AS s FROM c),
      rk AS (SELECT source, n,
          row_number() OVER (ORDER BY n, source) AS r FROM c),
      rec(r, u, source, n, alloc, capped) AS (
        SELECT 0, (SELECT t * 9 // 10 FROM tot), CAST(NULL AS VARCHAR),
          CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
          CAST(NULL AS BOOLEAN)
        UNION ALL
        SELECT rk.r,
          rec.u - least(rec.u // ((SELECT s FROM tot) - rec.r), rk.n),
          rk.source, rk.n,
          least(rec.u // ((SELECT s FROM tot) - rec.r), rk.n),
          (rk.n < rec.u // ((SELECT s FROM tot) - rec.r))
        FROM rec JOIN rk ON rk.r = rec.r + 1)
      SELECT source, CAST(n AS BIGINT) AS n_tokens,
        CAST(alloc AS BIGINT) AS alloc_tokens,
        round(alloc / CAST(n AS DOUBLE), 6) AS epochs, capped
      FROM rec WHERE r > 0 ORDER BY source""")),

    // ---- blocklist screen (C4, Raffel JMLR'20 §2.2; MassiveText):
    //      every phrase counted at token boundaries in ONE Aho-Corasick
    //      pass per doc (PhraseHits native) — zero shuffles, blocklist
    //      compiled into the plan. The list mixes lengths 1-3, an
    //      overlapping pair ("slow" ⊂ "slow query" — both count), and a
    //      never-matching entry; the oracle re-counts each phrase with
    //      positional list SQL and replays the first-max tie rule ------
    Q("x99_blocklist_screen",
      (s, dir) => graft.operators.Blocklist.screen(
        t(s, dir, "documents"), "doc_id", "text", blocklistPhrases)
        .orderBy(col("doc_id")),
      Some(blocklistOracleSql)),

    // ---- BM25 hard-negative mining (Karpukhin EMNLP'20 §3.2): per
    //      query, the top BM25 hits that are NOT the positive — the
    //      retriever-training negative sampler built on x81's scoring.
    //      Queries derive deterministically from every 97th doc: 4
    //      md5-ranked distinct tokens (per-query variety; the smallest-
    //      token variant collapsed every query to the same stopwords).
    //      tf computed ONCE per (doc, term) then fanned to queries by a
    //      broadcast join; per-query top-k is the x83 two-phase window --
    Q("x100_hard_negatives",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = t(s, dir, "documents")
        val queries = docs.filter(col("doc_id") % 97 === 1)
          .select(col("doc_id").as("query_id"),
            explode(array_distinct(split(col("text"), " "))).as("term"))
          .withColumn("rn", row_number().over(Window
            .partitionBy(col("query_id"))
            .orderBy(md5(concat(col("query_id").cast("string"),
              lit(":"), col("term"))))))
          .filter(col("rn") <= 4)
          .groupBy(col("query_id"))
          .agg(collect_list(col("term")).as("terms"))
        graft.operators.HardNegatives.mine(docs, "doc_id", "text",
          queries, topK = 10)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH qtok AS (SELECT DISTINCT doc_id AS query_id,
          unnest(string_split(text,' ')) AS term
        FROM documents WHERE doc_id % 97 = 1),
      qt AS (SELECT query_id, term FROM (
          SELECT query_id, term, row_number() OVER (PARTITION BY query_id
            ORDER BY md5(query_id || ':' || term)) AS rn FROM qtok)
        WHERE rn <= 4),
      dl AS (SELECT doc_id, len(string_split(text,' ')) AS dl
        FROM documents),
      st AS (SELECT count(*) AS n, sum(dl)*1.0/count(*) AS avgdl FROM dl),
      tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        WHERE term IN (SELECT DISTINCT term FROM qt)
        GROUP BY doc_id, term),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
        GROUP BY term),
      sc AS (SELECT tf.doc_id, tf.term, CAST(round(
          ln((st.n - df.df + 0.5)/(df.df + 0.5) + 1) *
          ((tf.tf * (1.2+1)) /
           (tf.tf + 1.2 * (1 - 0.75 + 0.75*dl.dl/st.avgdl))), 6)
          AS DECIMAL(18,6)) AS c
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN st),
      agg AS (SELECT qt.query_id, sc.doc_id, count(*) AS n_hit_terms,
          CAST(round(sum(sc.c), 4) AS DOUBLE) AS score
        FROM sc JOIN qt USING (term)
        WHERE sc.doc_id <> qt.query_id
        GROUP BY 1, 2),
      rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY score DESC, doc_id) AS rank FROM agg)
      SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id,
        n_hit_terms, score
      FROM rk WHERE rank <= 10 ORDER BY query_id, rank""")),

    // ---- JL signed random projection (Achlioptas JCSS'03, the SRP
    //      hyperplane family): 64 → 32 dims, cosine-preservation report
    //      over consecutive-id pairs. Components are UNSCALED 4dp dots
    //      (cosine is scale-invariant; the 1/sqrt(m) factor would cost
    //      exactness for nothing). Per-pair bound 0.75 ≈ 3σ at m=32
    //      (σ ~ sqrt((1+cos²)/m)); the spec adjudicates the mean, which
    //      concentrates — measured mean ≈ 0.14, max ≈ 0.47 at sf0.01 ---
    Q("x101_jl_projection",
      (s, dir) => graft.operators.JlProjection.pairPreservation(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 32, bound = 0.75)
        .orderBy(col("id_a")),
      Some(jlOracleSql(m = 32, bound = 0.75))),

    // ---- Inverse Cloze Task pairs (Lee ACL'19 §3.2): per doc, an
    //      md5-offset 8-token pseudo-query + its surrounding context —
    //      retriever-pretraining supervision from document structure
    //      alone. Zero-shuffle expression-only generator; short docs
    //      (< 16 tokens) dropped, not emitted with empty contexts ------
    Q("x102_ict_pairs",
      (s, dir) => graft.operators.Ict.pairs(
        t(s, dir, "documents"), "doc_id", "text", qTokens = 8)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS ts,
          len(string_split(text,' ')) AS n FROM documents),
      e AS (SELECT doc_id, ts, n,
          CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,12))::BIGINT
            % (n - 8 + 1) AS INT) AS start
        FROM t WHERE n >= 16)
      SELECT doc_id, CAST(start AS BIGINT) AS start,
        array_to_string(ts[start+1 : start+8], ' ') AS query,
        array_to_string(ts[1:start] || ts[start+9 : n], ' ') AS context,
        CAST(n AS BIGINT) AS n_tokens
      FROM e ORDER BY doc_id""")),

    // ---- T5 span corruption (Raffel JMLR'20 §3.1.4): sentinel-masked
    //      denoising examples — deterministic stride variant (spans of 3
    //      every 20 tokens from an md5 per-doc phase ⇒ exactly 15%
    //      corruption, engine-portable); inputs/targets both rebuilt by
    //      the oracle token-for-token, sub-stride docs dropped ----------
    Q("x103_span_corruption",
      (s, dir) => graft.operators.SpanCorruption.corrupt(
        t(s, dir, "documents"), "doc_id", "text",
        spanLen = 3, stride = 20)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS ts,
          len(string_split(text,' ')) AS n FROM documents),
      e AS (SELECT doc_id, ts, n,
          CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,12))::BIGINT
            % 20 AS INT) AS off
        FROM t WHERE n >= 20),
      m AS (SELECT doc_id, ts, n, off,
          CAST(len(list_filter(range(n),
            p -> p - off >= 0 AND (p - off) % 20 = 0)) AS BIGINT)
            AS n_spans,
          CAST(len(list_filter(range(n),
            p -> p - off >= 0 AND (p - off) % 20 < 3)) AS BIGINT)
            AS n_masked
        FROM e)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, n_spans,
        array_to_string(flatten(list_transform(range(n), p ->
          CASE WHEN p - off >= 0 AND (p - off) % 20 = 0
            THEN ['<extra_id_' || CAST((p - off) // 20 AS VARCHAR) || '>']
          WHEN p - off >= 0 AND (p - off) % 20 < 3
            THEN CAST([] AS VARCHAR[])
          ELSE [ts[p+1]] END)), ' ') AS inputs,
        array_to_string(flatten(list_transform(list_filter(range(n), p ->
            p - off >= 0 AND (p - off) % 20 = 0), p ->
          ['<extra_id_' || CAST((p - off) // 20 AS VARCHAR) || '>']
            || ts[p+1 : p+3]))
          || ['<extra_id_' || CAST(n_spans AS VARCHAR) || '>'], ' ')
          AS targets,
        round(n_masked / CAST(n AS DOUBLE), 4) AS corruption_ratio
      FROM m ORDER BY doc_id""")),

    // ---- MinHash-LSH parameter tuning (Leskovec/Rajaraman/Ullman MMDS
    //      ch.3): per (bands, rows) split of ONE shared 32-hash
    //      signature, measured candidates/precision/recall vs the x86
    //      exact join, next to the theoretical S-curve threshold —
    //      the report that picks the banding BEFORE a 100 TB dedup.
    //      Precision/recall via integer half-up micro-rounding (dyadic
    //      ratios land exactly on the 6dp half; doubles tie-break
    //      engine-dependently) ----------------------------------------
    Q("x104_lsh_tuning",
      (s, dir) => graft.operators.LshTuning.report(s,
        t(s, dir, "documents"), "doc_id", "text", n = 4,
        threshold = 0.5, numHashes = 32,
        bandsGrid = Seq(32, 16, 8, 4))
        .orderBy(col("bands").desc),
      Some(lshTuningOracleSql(numHashes = 32, grid = Seq(32, 16, 8, 4),
        threshold = 0.5))),

    // ---- langid confusion matrix: x20's stopword-profile classifier
    //      evaluated against the labeled lang column — the trust-report
    //      a pipeline runs before routing on a heuristic. On this
    //      shared-vocab synthetic corpus every label collapses to
    //      en/unk, which is exactly the failure the report exposes
    //      (zh has no profile at all). Fractions via the x104 integer
    //      micro-rounding (58/64 = 0.90625 is dyadic) ------------------
    Q("x105_langid_eval",
      (s, dir) => graft.operators.LangidEval.confusion(
        t(s, dir, "documents"), "lang", "text")
        .orderBy(col("lang_true"), col("lang_pred")),
      Some("""WITH sc AS (SELECT doc_id, lang,
          len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to','in','is'))) AS c_en,
          len(list_filter(string_split(text,' '), t -> t IN ('el','la','de','que','y','en','los'))) AS c_es,
          len(list_filter(string_split(text,' '), t -> t IN ('le','la','de','et','les','des','une'))) AS c_fr,
          len(list_filter(string_split(text,' '), t -> t IN ('der','die','und','das','von','den','zu'))) AS c_de
        FROM documents),
      pr AS (SELECT lang AS lang_true,
          CASE WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
               WHEN c_es > 0 AND c_es >= c_fr AND c_es >= c_de THEN 'es'
               WHEN c_fr > 0 AND c_fr >= c_de THEN 'fr'
               WHEN c_de > 0 THEN 'de'
               ELSE 'unk' END AS lang_pred
        FROM sc),
      cells AS (SELECT lang_true, lang_pred,
          CAST(count(*) AS BIGINT) AS n
        FROM pr GROUP BY 1, 2),
      tot AS (SELECT lang_true, CAST(sum(n) AS BIGINT) AS tot
        FROM cells GROUP BY 1)
      SELECT c.lang_true, c.lang_pred, c.n,
        CAST((c.n*2000000 + t.tot) // (2*t.tot) AS DOUBLE)/1000000.0
          AS frac_of_true,
        (c.lang_true = c.lang_pred) AS is_correct
      FROM cells c JOIN tot t USING (lang_true)
      ORDER BY c.lang_true, c.lang_pred""")),

    // ---- DoReMi-lite domain reweighting (Xie NeurIPS'23): per-source
    //      excess bigram-NLL over the corpus reference → EG boost →
    //      micro-rounded normalized weights + uniform-smoothed mix.
    //      Corpus work = ONE x40 scoring pass; the rest is arithmetic
    //      on the sources-sized frame ----------------------------------
    Q("x106_doremi_mix",
      (s, dir) => graft.operators.DomainReweight.doremiMix(
        t(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy(col("source")),
      Some(s"""WITH scored AS ($lmNllSql),
        j AS (SELECT s.doc_id, s.avg_nll, d.source
              FROM scored s JOIN documents d USING (doc_id)),
        dom AS (SELECT source, count(*) AS n_docs,
            sum(CAST(avg_nll AS DECIMAL(18,4))) AS snll
          FROM j GROUP BY 1),
        ref AS (SELECT sum(CAST(avg_nll AS DECIMAL(18,4))) AS rs,
            count(*) AS rn FROM j),
        st AS (SELECT source, n_docs,
            floor((CAST(snll AS DOUBLE)/n_docs) * 1000000 + 0.5)
              / 1000000 AS mean_nll,
            greatest(0.0, floor(
              (floor((CAST(snll AS DOUBLE)/n_docs) * 1000000 + 0.5)
                 / 1000000
               - floor((CAST(rs AS DOUBLE)/rn) * 1000000 + 0.5)
                 / 1000000) * 1000000 + 0.5) / 1000000) AS excess
          FROM dom CROSS JOIN ref),
        bm AS (SELECT source, n_docs, mean_nll, excess,
            CAST(round(exp(1.0*excess), 6) AS DECIMAL(18,6)) AS boost,
            CAST(CAST(round(exp(1.0*excess), 6) AS DECIMAL(18,6))*1000000
              AS BIGINT) AS bmicro
          FROM st),
        tb AS (SELECT CAST(sum(bmicro) AS BIGINT) AS btot,
            count(*) AS nsrc FROM bm)
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs, mean_nll, excess,
          CAST(boost AS DOUBLE) AS boost,
          CAST((bmicro*2000000 + btot) // (2*btot) AS DOUBLE)/1000000.0
            AS weight,
          CAST((2000000*((5-1)*bmicro*nsrc + 1*btot) + 5*nsrc*btot)
            // (2*5*nsrc*btot) AS DOUBLE)/1000000.0 AS mix
        FROM bm CROSS JOIN tb ORDER BY source""")),

    // ---- FineWeb/DCLM-style quality ensemble: three heterogeneous
    //      signals (negated x40 NLL, log token count, stopword ratio)
    //      z-normalized per source from EXACT decimal moments — no
    //      per-source window sort, one corpus agg + broadcast stats.
    //      Docs without bigrams carry no NLL and drop (inner join) -----
    Q("x108_quality_ensemble",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val scored = graft.operators.LmScore
          .bigramNll(docs, "doc_id", "text")
        val sig = docs
          .join(scored.select(col("doc_id"), col("avg_nll")), "doc_id")
          .withColumn("toks", tokens(col("text")))
        graft.operators.QualityEnsemble.zscoreComposite(
          sig, "doc_id", "source", Seq(
            "nll" -> -col("avg_nll"),
            "logtok" -> round(log(lit(1.0)
              + nTokens(col("toks"))), 6),
            "stop" -> stopwordRatio(col("toks"))))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH scored AS ($lmNllSql),
        sig AS (SELECT d.doc_id, d.source,
            CAST(round(-s.avg_nll, 6) AS DECIMAL(18,6)) AS s1,
            CAST(round(ln(1.0 + len(string_split(d.text,' '))), 6)
              AS DECIMAL(18,6)) AS s2,
            CAST(round(CAST(len(list_filter(string_split(d.text,' '),
              t -> t IN ('the','a','of','and','to','in','is')))
              AS DOUBLE) / len(string_split(d.text,' ')), 6)
              AS DECIMAL(18,6)) AS s3
          FROM documents d JOIN scored s USING (doc_id)),
        st AS (SELECT source, count(*) AS n,
            sum(s1) AS sx1, sum(s1*s1) AS sxx1,
            sum(s2) AS sx2, sum(s2*s2) AS sxx2,
            sum(s3) AS sx3, sum(s3*s3) AS sxx3
          FROM sig GROUP BY 1),
        ms AS (SELECT source, n,
            CAST(sx1 AS DOUBLE)/n AS m1,
            sqrt(CAST(sxx1 AS DOUBLE)/n
              - (CAST(sx1 AS DOUBLE)/n)*(CAST(sx1 AS DOUBLE)/n)) AS sd1,
            CAST(sx2 AS DOUBLE)/n AS m2,
            sqrt(CAST(sxx2 AS DOUBLE)/n
              - (CAST(sx2 AS DOUBLE)/n)*(CAST(sx2 AS DOUBLE)/n)) AS sd2,
            CAST(sx3 AS DOUBLE)/n AS m3,
            sqrt(CAST(sxx3 AS DOUBLE)/n
              - (CAST(sx3 AS DOUBLE)/n)*(CAST(sx3 AS DOUBLE)/n)) AS sd3
          FROM st),
        z AS (SELECT g.doc_id, g.source,
            CASE WHEN sd1 > 0.0
              THEN floor(((CAST(s1 AS DOUBLE) - m1)/sd1)
                          * 1000000 + 0.5) / 1000000
              ELSE 0.0 END AS z_nll,
            CASE WHEN sd2 > 0.0
              THEN floor(((CAST(s2 AS DOUBLE) - m2)/sd2)
                          * 1000000 + 0.5) / 1000000
              ELSE 0.0 END AS z_logtok,
            CASE WHEN sd3 > 0.0
              THEN floor(((CAST(s3 AS DOUBLE) - m3)/sd3)
                          * 1000000 + 0.5) / 1000000
              ELSE 0.0 END AS z_stop
          FROM sig g JOIN ms USING (source))
        SELECT doc_id, source, z_nll, z_logtok, z_stop,
          floor(((z_nll + z_logtok + z_stop)/3) * 1000000 + 0.5)
            / 1000000 AS composite
        FROM z ORDER BY doc_id""")),

    // ---- per-source lexical diversity: TTR, distinct-bigram ratio,
    //      unigram entropy via H = ln N − (Σ c·ln c)/N — the corpus
    //      health axis x47's volume/dup shares don't see (template
    //      soup = low entropy at equal volume). Vocab-sized count
    //      tables, sources-sized rollups, no distinct over raw rows ----
    Q("x109_diversity_report",
      (s, dir) => graft.operators.Diversity.report(
        t(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy(col("source")),
      Some("""WITH t AS (SELECT doc_id, source,
          string_split(text,' ') AS ts FROM documents),
        dc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM t GROUP BY 1),
        uni AS (SELECT source, unnest(ts) AS w FROM t),
        uc AS (SELECT source, w, count(*) AS c FROM uni GROUP BY 1, 2),
        us AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
            CAST(count(*) AS BIGINT) AS distinct_tokens,
            sum(c * CAST(round(ln(c), 6) AS DECIMAL(18,6))) AS slc
          FROM uc GROUP BY 1),
        bgx AS (SELECT source, ts[i+1] || ' ' || ts[i+2] AS b
          FROM (SELECT source, ts, unnest(range(len(ts)-1)) AS i FROM t)),
        bc AS (SELECT source, b, count(*) AS c FROM bgx GROUP BY 1, 2),
        bs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_bigrams,
            CAST(count(*) AS BIGINT) AS distinct_bigrams
          FROM bc GROUP BY 1)
        SELECT dc.source, dc.n_docs, us.n_tokens, us.distinct_tokens,
          CAST((us.distinct_tokens*2000000 + us.n_tokens)
            // (2*us.n_tokens) AS DOUBLE)/1000000.0 AS ttr,
          COALESCE(bs.n_bigrams, 0) AS n_bigrams,
          COALESCE(bs.distinct_bigrams, 0) AS distinct_bigrams,
          CASE WHEN bs.n_bigrams > 0 THEN
            CAST((bs.distinct_bigrams*2000000 + bs.n_bigrams)
              // (2*bs.n_bigrams) AS DOUBLE)/1000000.0 END AS distinct2,
          floor((round(ln(us.n_tokens), 6)
            - CAST(us.slc AS DOUBLE)/us.n_tokens) * 1000000 + 0.5)
            / 1000000 AS entropy
        FROM dc JOIN us USING (source) LEFT JOIN bs USING (source)
        ORDER BY dc.source""")),

    // ---- packing boundary manifest: x35's bins + each doc's
    //      [offset, end) span / position inside its (shard, bin)
    //      sequence + bin totals — the attention-mask metadata a
    //      packer writes when bins concatenate into training windows ---
    Q("x110_pack_boundaries",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("n_tokens", nTokens(tokens(col("text"))))
        graft.operators.Sampling.packManifest(docs, "doc_id",
          "n_tokens", budget = 2048L, shards = 8)
          .select(col("doc_id"), col("shard").cast("long").as("shard"),
            col("bin"), col("n_tokens"), col("pos_in_bin"),
            col("offset"), col("end_offset"), col("bin_docs"),
            col("bin_fill"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH p AS (SELECT doc_id, doc_id % 8 AS shard,
          CAST(floor(COALESCE(SUM(len(string_split(text,' '))) OVER (
            PARTITION BY doc_id % 8 ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048)
            AS BIGINT) AS bin,
          CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
        FROM documents)
        SELECT doc_id, shard, bin, n_tokens,
          CAST(row_number() OVER w AS BIGINT) AS pos_in_bin,
          CAST(COALESCE(SUM(n_tokens) OVER (w
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS offset,
          CAST(COALESCE(SUM(n_tokens) OVER (w
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + n_tokens AS BIGINT) AS end_offset,
          CAST(count(*) OVER (PARTITION BY shard, bin) AS BIGINT)
            AS bin_docs,
          CAST(SUM(n_tokens) OVER (PARTITION BY shard, bin) AS BIGINT)
            AS bin_fill
        FROM p
        WINDOW w AS (PARTITION BY shard, bin ORDER BY doc_id)
        ORDER BY doc_id""")),

    // ---- SPAN-level decontamination: x33's benchmark split, but only
    //      the words covered by a bench-colliding 8-gram are removed
    //      (x38's rewrite machinery) — the surgical alternative to
    //      dropping a whole doc over one quoted test sentence ----------
    Q("x111_span_decontaminate",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Dedup.spanDecontaminate(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", n = 8)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tt AS (SELECT doc_id, string_split(text,' ') AS ts
          FROM documents WHERE doc_id % 20 <> 0),
        bt AS (SELECT string_split(text,' ') AS ts
          FROM documents WHERE doc_id % 20 = 0),
        bh AS (SELECT DISTINCT
            md5(array_to_string(list_slice(ts, pos+1, pos+8), '_')) AS h
          FROM (SELECT ts, unnest(range(len(ts)-7)) AS pos FROM bt)),
        ch AS (SELECT doc_id, pos,
            md5(array_to_string(list_slice(ts, pos+1, pos+8), '_')) AS h
          FROM (SELECT doc_id, ts, unnest(range(len(ts)-7)) AS pos
                FROM tt)),
        bad AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS starts
          FROM ch JOIN bh USING (h) GROUP BY doc_id),
        jn AS (SELECT tt.doc_id, tt.ts, coalesce(bad.starts, []) AS starts
          FROM tt LEFT JOIN bad USING (doc_id)),
        kp AS (SELECT doc_id, ts, starts,
            list_filter(range(len(ts)),
              p -> len(list_filter(starts,
                s -> s <= p AND p <= s + 7)) = 0) AS keepj
          FROM jn)
        SELECT doc_id,
          coalesce(array_to_string(
            list_transform(keepj, p -> ts[p+1]), ' '), '') AS clean_text,
          CAST(len(ts) - len(keepj) AS BIGINT) AS n_removed,
          CAST(len(starts) AS BIGINT) AS n_hit_spans,
          len(starts) > 0 AS contaminated
        FROM kp ORDER BY doc_id""")),

    // ---- k-anonymity audit (Sweeney IJUFKS'02): equivalence classes
    //      over (source, lang, 256-char size bucket) with n < k flagged
    //      — the metadata-linkage privacy axis x34's token-level PII
    //      redaction cannot see ----------------------------------------
    Q("x112_k_anonymity",
      (s, dir) => graft.operators.KAnonymity.classReport(
        t(s, dir, "documents"), Seq(
          "source" -> col("source"),
          "lang" -> col("lang"),
          "size_bucket" -> expr("n_chars DIV 256")), k = 5L)
        .orderBy(col("source"), col("lang"), col("size_bucket")),
      Some("""WITH cls AS (SELECT source, lang,
            n_chars // 256 AS size_bucket,
            CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY 1, 2, 3),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cls)
        SELECT source, lang, size_bucket, n,
          n >= 5 AS k_anonymous,
          CAST((n*2000000 + nt) // (2*nt) AS DOUBLE)/1000000.0
            AS share_of_corpus
        FROM cls CROSS JOIN tot
        ORDER BY source, lang, size_bucket""")),

    // ---- tokenizer fertility by language (the UniMax/x98 companion
    //      metric: subword-per-word and chars-per-subword rates decide
    //      how a token budget converts to text volume per language;
    //      Chung ICLR'23 budgets in tokens, fertility converts) — one
    //      integer agg over the x08 natives ----------------------------
    Q("x113_tokenizer_fertility",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"),
          sum(nTokens(tokens(col("text")))).as("ws_tokens"),
          sum(bpeishTokenCount(col("text")).cast("long"))
            .as("bpeish_tokens"))
        .select(col("lang"), col("n_docs"), col("n_chars"),
          col("ws_tokens"), col("bpeish_tokens"),
          expr("CAST((bpeish_tokens*2000000 + ws_tokens) " +
            "DIV (2*ws_tokens) AS DOUBLE)/1000000.0").as("fertility"),
          expr("CAST((n_chars*2000000 + bpeish_tokens) " +
            "DIV (2*bpeish_tokens) AS DOUBLE)/1000000.0")
            .as("chars_per_token"))
        .orderBy(col("lang")),
      Some("""WITH a AS (SELECT lang,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(length(text)) AS BIGINT) AS n_chars,
          CAST(sum(len(string_split(text,' '))) AS BIGINT) AS ws_tokens,
          CAST(sum(len(regexp_extract_all(text,
            '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpeish_tokens
        FROM documents GROUP BY 1)
        SELECT lang, n_docs, n_chars, ws_tokens, bpeish_tokens,
          CAST((bpeish_tokens*2000000 + ws_tokens)
            // (2*ws_tokens) AS DOUBLE)/1000000.0 AS fertility,
          CAST((n_chars*2000000 + bpeish_tokens)
            // (2*bpeish_tokens) AS DOUBLE)/1000000.0 AS chars_per_token
        FROM a ORDER BY lang""")),

    // ---- deletion-impact audit (right-to-be-forgotten planning):
    //      which shards a takedown id-list touches, at what doc/byte
    //      cost, and whether each needs a rewrite — unmatched takedown
    //      ids surface as an audit count, never silence ----------------
    Q("x114_deletion_impact",
      (s, dir) => {
        val assigned = t(s, dir, "documents")
          .select(col("doc_id"), pmod(col("doc_id"), lit(16L)).as("shard"),
            col("n_chars"))
        val deletes = t(s, dir, "documents")
          .filter(col("doc_id") % 97 === 3).select(col("doc_id"))
          .union(s.range(1).select((lit(10000000L)).as("doc_id")))
        graft.operators.DeletionImpact.report(assigned, deletes,
          "doc_id", "shard", "n_chars")
          .orderBy(col("shard"))
      },
      Some("""WITH asg AS (SELECT doc_id, doc_id % 16 AS shard,
            n_chars FROM documents),
        del AS (SELECT DISTINCT doc_id FROM (
            SELECT doc_id FROM documents WHERE doc_id % 97 = 3
            UNION ALL SELECT 10000000 AS doc_id)),
        mk AS (SELECT a.shard, a.n_chars,
            (d.doc_id IS NOT NULL) AS hit
          FROM asg a LEFT JOIN del d USING (doc_id)),
        ps AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS n_bytes,
            CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
              AS n_deleted,
            CAST(sum(CASE WHEN hit THEN n_chars ELSE 0 END) AS BIGINT)
              AS deleted_bytes
          FROM mk GROUP BY 1),
        um AS (SELECT CAST(count(*) AS BIGINT) AS n_unmatched
          FROM del WHERE doc_id NOT IN (SELECT doc_id FROM asg))
        SELECT shard, n_docs, n_bytes, n_deleted, deleted_bytes,
          CAST((n_deleted*2000000 + n_docs) // (2*n_docs) AS DOUBLE)
            /1000000.0 AS share_docs_deleted,
          CASE WHEN n_bytes > 0 THEN
            CAST((deleted_bytes*2000000 + n_bytes) // (2*n_bytes)
              AS DOUBLE)/1000000.0 ELSE 0.0 END AS share_bytes_deleted,
          n_deleted > 0 AS needs_rewrite,
          um.n_unmatched
        FROM ps CROSS JOIN um ORDER BY shard""")),

    // ---- STREAMING suppression ledger (x114's continuous twin):
    //      takedown requests land as files, two AvailableNow runs append
    //      only unseen request batches (offset-log cursor), and the
    //      impact report runs over the cumulative replay-idempotent
    //      suppression set -------------------------------------------
    Q("x115_streaming_suppression",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
        val requests = docs.filter(col("doc_id") % 97 === 3)
          .select(col("doc_id"))
        val split = requests.agg(expr("(min(doc_id) + max(doc_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("supldg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/supldg")
        s.sql("CREATE DATABASE IF NOT EXISTS supldg")
        s.sql("DROP TABLE IF EXISTS supldg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("supldg.db/ledger")))
          Materializer.deleteRecursively(p)
        requests.filter(col("doc_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
        val schema = s.read.parquet(landing.toString).schema
        graft.streaming.EventStreams.streamingSuppressionLedger(s,
          landing.toString, schema, "supldg.ledger", ckpt.toString,
          "doc_id")
        requests.filter(col("doc_id") > split)
          .write.mode("append").parquet(landing.toString)
        graft.streaming.EventStreams.streamingSuppressionLedger(s,
          landing.toString, schema, "supldg.ledger", ckpt.toString,
          "doc_id")
        val assigned = docs.select(col("doc_id"),
          pmod(col("doc_id"), lit(16L)).as("shard"), col("n_chars"))
        graft.operators.DeletionImpact.report(assigned,
          graft.streaming.EventStreams.suppressionSet(
            s.table("supldg.ledger"), "doc_id"),
          "doc_id", "shard", "n_chars")
          .orderBy(col("shard"))
      },
      Some("""WITH asg AS (SELECT doc_id, doc_id % 16 AS shard,
            n_chars FROM documents),
        del AS (SELECT DISTINCT doc_id FROM documents
          WHERE doc_id % 97 = 3),
        mk AS (SELECT a.shard, a.n_chars,
            (d.doc_id IS NOT NULL) AS hit
          FROM asg a LEFT JOIN del d USING (doc_id)),
        ps AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS n_bytes,
            CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
              AS n_deleted,
            CAST(sum(CASE WHEN hit THEN n_chars ELSE 0 END) AS BIGINT)
              AS deleted_bytes
          FROM mk GROUP BY 1)
        SELECT shard, n_docs, n_bytes, n_deleted, deleted_bytes,
          CAST((n_deleted*2000000 + n_docs) // (2*n_docs) AS DOUBLE)
            /1000000.0 AS share_docs_deleted,
          CASE WHEN n_bytes > 0 THEN
            CAST((deleted_bytes*2000000 + n_bytes) // (2*n_bytes)
              AS DOUBLE)/1000000.0 ELSE 0.0 END AS share_bytes_deleted,
          n_deleted > 0 AS needs_rewrite,
          CAST(0 AS BIGINT) AS n_unmatched
        FROM ps ORDER BY shard""")),

    // ---- nested ablation subsets (scaling-law methodology): doc ∈
    //      p-subset iff frac(md5(id)) < p, so 1% ⊂ 2% ⊂ 5% ⊂ … by
    //      construction; membership is an integer/hex-string compare,
    //      cumulative counts over the buckets-sized frame --------------
    Q("x116_ablation_slices",
      (s, dir) => graft.operators.AblationSlices.nestedCounts(
        t(s, dir, "documents"), "doc_id", "text", "source",
        ablationPermilles)
        .orderBy(col("permille"), col("source")),
      Some(s"""WITH f AS (SELECT source,
            substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS h6,
            len(string_split(text,' ')) AS nt FROM documents),
        b AS (SELECT source, nt,
            CASE $ablationCaseSql END AS permille FROM f),
        g AS (SELECT permille, source, CAST(count(*) AS BIGINT) AS d,
            CAST(sum(nt) AS BIGINT) AS t FROM b GROUP BY 1, 2)
        SELECT CAST(permille AS BIGINT) AS permille, source,
          CAST(sum(d) OVER w AS BIGINT) AS n_docs,
          CAST(sum(t) OVER w AS BIGINT) AS n_tokens
        FROM g
        WINDOW w AS (PARTITION BY source ORDER BY permille
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY permille, source""")),

    // ---- audio decode + energy signals (multimodal: the audio member).
    //      REAL RIFF/WAVE PCM-16 bytes packed from a deterministic
    //      square-wave fixture, decoded back by a real chunk walk; the
    //      oracle computes every signal in CLOSED FORM from the same
    //      fixture arithmetic (all-integer — no sample replay, no float).
    //      Signals: duration, peak, energy (Σs²), clipping count,
    //      windowed silence (160-sample energy-VAD windows) -------------
    Q("x117_audio_decode",
      (s, dir) => {
        val spec = t(s, dir, "documents").select(col("doc_id"),
          element_at(typedlit(Seq(8000, 16000, 44100)),
            (col("doc_id") % 3).cast("int") + 1).as("rate"),
          (lit(400) + pmod(col("doc_id") * 7 + col("n_chars"), lit(800)))
            .cast("int").as("n"),
          when(col("doc_id") % 5 === 0, lit(32767))
            .otherwise(lit(500) + pmod(col("doc_id") * 13, lit(30)) * 1000)
            .cast("int").as("amp"),
          (lit(4) + pmod(col("doc_id"), lit(13))).cast("int").as("halfp"),
          (pmod(col("doc_id") * 3 + 1, lit(5)) * 80).cast("int").as("q"),
          lit(0).as("r"))
        // silent prefix of q samples, then a ±amp square wave of
        // half-period halfp — synthesized map-side (the per-sample HOF
        // was interpreted), over a spec pre-sorted by id so no trailing
        // orderBy re-evaluates the opaque chain for range sampling
        val ordered = spec.repartitionByRange(col("doc_id"))
          .sortWithinPartitions("doc_id")
        val withSamples = Audio.synthSquare(s, ordered)
        val packed = Audio.packWav(s, withSamples, "doc_id", "rate",
          "samples").toDF()
          .withColumn("payload", when(col("id") % 97 === 0,
            expr("substring(payload, 1, 6)")).otherwise(col("payload")))
        Audio.analyze(s, packed).toDF()
      },
      Some("""WITH s AS (SELECT doc_id AS id,
          CASE WHEN doc_id % 3 = 0 THEN 8000
               WHEN doc_id % 3 = 1 THEN 16000 ELSE 44100 END AS rate,
          400 + (doc_id*7 + n_chars) % 800 AS n,
          CASE WHEN doc_id % 5 = 0 THEN 32767
               ELSE 500 + (doc_id*13 % 30) * 1000 END AS amp,
          (doc_id*3 + 1) % 5 * 80 AS q
        FROM documents)
        SELECT id,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(rate AS BIGINT) END AS sample_rate,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(n AS BIGINT) END AS n_samples,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(n*1000 // rate AS BIGINT) END AS duration_ms,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(amp AS BIGINT) END AS peak_abs,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST((n-q)*amp*amp AS BIGINT) END AS sum_sq,
          CASE WHEN id % 97 = 0 THEN NULL
               WHEN amp = 32767 THEN CAST(n-q AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS n_clipped,
          CAST(CASE WHEN id % 97 = 0 THEN NULL
               ELSE n // 160 END AS BIGINT) AS n_windows,
          CAST(CASE WHEN id % 97 = 0 THEN NULL
               ELSE q // 160 END AS BIGINT) AS n_silent_windows
        FROM s ORDER BY id""")),

    // ---- margin-based bitext mining (Artetxe & Schwenk ACL'19, the
    //      CCMatrix/LASER step): pairs between two embedding sets score
    //      by cos over the mean of both sides' top-k neighborhoods —
    //      raw cosine is hubness-miscalibrated, the ratio margin isn't.
    //      4dp cosines → e4 integers → micro-unit margins via integer
    //      div (nonnegative operands: Spark div == DuckDB //) ----------
    Q("x118_bitext_margin",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        graft.operators.Bitext.mineMargin(
          e.filter(col("vec_id") % 2 === 0),
          e.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMarginMicro = 1000000L)
          .orderBy(col("src_id"))
      },
      Some {
        val d = dotSql.format("x.embedding", "x.embedding", "y.embedding")
        val n = dotSql.format("embedding", "embedding", "embedding")
        s"""WITH e AS (SELECT vec_id, embedding, sqrt($n) AS nrm
            FROM embeddings),
          p AS (SELECT x.vec_id AS sid, y.vec_id AS tid,
              round($d / (x.nrm*y.nrm), 4) AS cos,
              CAST(round(round($d / (x.nrm*y.nrm), 4)*10000) AS BIGINT) AS c4
            FROM e x JOIN e y
              ON x.vec_id % 2 = 0 AND y.vec_id % 2 = 1),
          fk AS (SELECT * FROM (SELECT *, row_number() OVER
              (PARTITION BY sid ORDER BY cos DESC, tid) rk FROM p)
            WHERE rk <= 4),
          bk AS (SELECT * FROM (SELECT *, row_number() OVER
              (PARTITION BY tid ORDER BY cos DESC, sid) rk FROM p)
            WHERE rk <= 4),
          dx AS (SELECT sid, sum(c4) AS den_x FROM fk GROUP BY sid),
          dy AS (SELECT tid, sum(c4) AS den_y FROM bk GROUP BY tid),
          mf AS (SELECT fk.sid, fk.tid, fk.cos,
              fk.c4 * 8 * 1000000 // (dx.den_x + dy.den_y) AS mm
            FROM fk JOIN dx USING (sid) JOIN dy USING (tid)
            WHERE fk.c4 > 0 AND dx.den_x + dy.den_y > 0),
          bf AS (SELECT *, row_number() OVER
              (PARTITION BY sid ORDER BY mm DESC, tid) r FROM mf),
          mb AS (SELECT bk.sid, bk.tid,
              bk.c4 * 8 * 1000000 // (dx.den_x + dy.den_y) AS mm
            FROM bk JOIN dx USING (sid) JOIN dy USING (tid)
            WHERE bk.c4 > 0 AND dx.den_x + dy.den_y > 0),
          bb AS (SELECT sid, tid FROM (SELECT *, row_number() OVER
              (PARTITION BY tid ORDER BY mm DESC, sid) r FROM mb)
            WHERE r = 1)
          SELECT bf.sid AS src_id, bf.tid AS tgt_id, bf.cos,
            CAST(bf.mm AS BIGINT) AS margin_micro,
            (bb.sid IS NOT NULL) AS is_mutual
          FROM bf LEFT JOIN bb ON bf.sid = bb.sid AND bf.tid = bb.tid
          WHERE bf.r = 1 AND bf.mm >= 1000000
          ORDER BY src_id"""
      }),

    // ---- inter-filter agreement (Cohen 1960): the x51 weak-label rule
    //      gate vs the classifier it supervises — raw agreement looks
    //      high whenever one class dominates; kappa reports the excess
    //      over the chance floor, and the disagreement mass is the
    //      docs-to-audit list. Integer counts end-to-end; kappa in
    //      micro-units via FLOORED division (κ < 0 = systematic
    //      disagreement; Spark div truncates, so floor is spelled out) --
    Q("x119_filter_agreement",
      (s, dir) => graft.operators.Agreement.cohenKappa(
        nbScored(s, dir).select(col("label"),
          col("pred").cast("long").as("pred")),
        "label", "pred"),
      Some(s"""WITH sc AS ($nbScoreSql),
        r AS (SELECT CAST(label AS BIGINT) AS a, CAST(pred AS BIGINT) AS b
          FROM sc),
        cells AS (SELECT a, b, count(*) AS c FROM r GROUP BY a, b),
        t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree
          FROM cells),
        ra AS (SELECT a AS v, sum(c) AS ra FROM cells GROUP BY a),
        cb AS (SELECT b AS v, sum(c) AS cb FROM cells GROUP BY b),
        pe AS (SELECT CAST(coalesce(sum(ra*cb), 0) AS BIGINT) AS pe_num
          FROM ra JOIN cb USING (v))
        SELECT n, n_agree, n - n_agree AS n_disagree,
          CAST(n_agree*1000000 // n AS BIGINT) AS po_micro,
          CAST(pe_num*1000000 // (n*n) AS BIGINT) AS pe_micro,
          CAST(CASE WHEN n*n - pe_num > 0 THEN
            (n*n_agree - pe_num)*1000000 // (n*n - pe_num) END AS BIGINT)
            AS kappa_micro
        FROM t CROSS JOIN pe""")),

    // ---- semantic diversity cap: capPerGroup's embedding-space twin —
    //      at most n vectors survive per SRP sign-cell, so no embedding
    //      neighborhood dominates the mix. Cells replay exactly in the
    //      oracle (md5-seeded ±1 hyperplanes, the x31 machinery);
    //      selection is md5-rank within cell, rerun-stable ------------
    Q("x120_semantic_cap",
      (s, dir) => graft.operators.Sampling.semanticCellCap(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, cellBits = 6, n = 8)
        .select(col("vec_id"), col("cell"))
        .orderBy(col("cell"), col("vec_id")),
      Some(s"""WITH c AS (SELECT vec_id,
          ${(0 until 6).map(srpBitSql).mkString("||")} AS cell
          FROM embeddings),
        r AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
          FROM c)
        SELECT vec_id, cell FROM r WHERE rk <= 8
        ORDER BY cell, vec_id""")),

    // ---- audio silence trim (x117's transform twin, the x49 shape for
    //      sound): decode → strip leading/trailing silence → re-encode a
    //      spec-valid WAV. Fixture carries BOTH a silent prefix q and a
    //      silent tail r around the square wave; the oracle states every
    //      output count in closed form — all integers -------------------
    Q("x121_audio_trim",
      (s, dir) => {
        val spec = t(s, dir, "documents").select(col("doc_id"),
          element_at(typedlit(Seq(8000, 16000, 44100)),
            (col("doc_id") % 3).cast("int") + 1).as("rate"),
          (lit(600) + pmod(col("doc_id") * 7 + col("n_chars"), lit(800)))
            .cast("int").as("n"),
          (lit(500) + pmod(col("doc_id") * 13, lit(30)) * 1000)
            .cast("int").as("amp"),
          (lit(4) + pmod(col("doc_id"), lit(13))).cast("int").as("halfp"),
          (pmod(col("doc_id") * 3 + 1, lit(5)) * 80).cast("int").as("q"),
          (pmod(col("doc_id") * 7 + 2, lit(5)) * 40).cast("int").as("r"))
        // sort the CHEAP spec up front and keep every later stage
        // map-side order-preserving: a trailing orderBy would range-
        // SAMPLE its child, i.e. evaluate the whole opaque synth+pack+
        // trim chain twice (measured: 0.92 s -> 1.95 s); synthSquare
        // replaces the per-sample interpreted HOF (guide §1.2 step 2)
        val ordered = spec.repartitionByRange(col("doc_id"))
          .sortWithinPartitions("doc_id")
        val withSamples = Audio.synthSquare(s, ordered)
        val packed = Audio.packWav(s, withSamples, "doc_id", "rate",
          "samples").toDF()
          .withColumn("payload", when(col("id") % 97 === 0,
            expr("substring(payload, 1, 6)")).otherwise(col("payload")))
        Audio.trimSilence(s, packed).toDF()
          .select(col("id"), col("trimmed"), col("n_in"), col("n_out"),
            col("lead_trimmed"), col("trail_trimmed"),
            col("duration_out_ms"), col("n_bytes"))
      },
      Some("""WITH s AS (SELECT doc_id AS id,
          CASE WHEN doc_id % 3 = 0 THEN 8000
               WHEN doc_id % 3 = 1 THEN 16000 ELSE 44100 END AS rate,
          600 + (doc_id*7 + n_chars) % 800 AS n,
          (doc_id*3 + 1) % 5 * 80 AS q,
          (doc_id*7 + 2) % 5 * 40 AS r
        FROM documents)
        SELECT id, id % 97 <> 0 AS trimmed,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(n AS BIGINT) END AS n_in,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(n - q - r AS BIGINT) END AS n_out,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(q AS BIGINT) END AS lead_trimmed,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(r AS BIGINT) END AS trail_trimmed,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST((n - q - r)*1000 // rate AS BIGINT)
               END AS duration_out_ms,
          CASE WHEN id % 97 = 0 THEN CAST(6 AS BIGINT)
               ELSE CAST(44 + 2*(n - q - r) AS BIGINT) END AS n_bytes
        FROM s ORDER BY id""")),

    // ---- image-text PAIR curation (the LAION-style manifest): join
    //      captions with their packed images, gate on BOTH sides —
    //      image must decode with min dims, caption must pass quality —
    //      and emit the pair manifest with a deterministic first-failing
    //      reject_reason (audit-friendly: every drop is attributable) --
    Q("x122_pair_curation",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val spec = docs.select(col("doc_id"),
          element_at(typedlit(Seq("png", "jpeg", "gif")),
            (col("doc_id") % 3).cast("int") + 1).as("fmt"),
          (lit(1) + pmod(col("doc_id") * 7 + col("n_chars"), lit(1024)))
            .cast("int").as("w"),
          (lit(1) + pmod(col("doc_id") * 13 + col("n_chars") * 3, lit(768)))
            .cast("int").as("h"))
        val packed = Multimodal.packImages(s, spec, "doc_id", "fmt", "w", "h")
          .toDF()
          .withColumn("payload", when(col("id") % 97 === 0,
            expr("substring(payload, 1, 6)")).otherwise(col("payload")))
        val dec = Multimodal.decodeHeaders(s, packed).toDF()
          .select(col("id").as("doc_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
        val txt = docs.withColumn("toks", tokens(col("text")))
          .select(col("doc_id"), nTokens(col("toks")).as("n_tokens"),
            (stopwordRatio(col("toks")) > 0).as("has_stopword"))
        txt.join(dec, Seq("doc_id"))
          .withColumn("image_ok", col("width").isNotNull &&
            col("width") >= 64 && col("height") >= 64)
          .withColumn("text_ok",
            col("n_tokens").between(5, 2000) && col("has_stopword"))
          .withColumn("pair_ok", col("image_ok") && col("text_ok"))
          .withColumn("reject_reason",
            when(col("width").isNull, "undecodable")
              .when(col("width") < 64 || col("height") < 64, "too_small")
              .when(!col("text_ok"), "bad_caption"))
          .select(col("doc_id"), col("n_tokens"), col("has_stopword"),
            col("width"), col("height"), col("image_ok"), col("text_ok"),
            col("pair_ok"), col("reject_reason"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id,
          CASE WHEN doc_id % 97 = 0 THEN NULL
               ELSE 1 + (doc_id*7 + n_chars) % 1024 END AS w,
          CASE WHEN doc_id % 97 = 0 THEN NULL
               ELSE 1 + (doc_id*13 + n_chars*3) % 768 END AS h,
          string_split(text, ' ') AS ts
        FROM documents),
        g AS (SELECT doc_id, w, h,
          CAST(len(ts) AS BIGINT) AS n_tokens,
          len(list_filter(ts, t ->
            t IN ('the','a','of','and','to','in','is'))) > 0 AS has_stopword
        FROM b),
        v AS (SELECT *,
          w IS NOT NULL AND w >= 64 AND h >= 64 AS image_ok,
          n_tokens BETWEEN 5 AND 2000 AND has_stopword AS text_ok
        FROM g)
        SELECT doc_id, n_tokens, has_stopword,
          CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
          image_ok, text_ok, image_ok AND text_ok AS pair_ok,
          CASE WHEN w IS NULL THEN 'undecodable'
               WHEN w < 64 OR h < 64 THEN 'too_small'
               WHEN NOT text_ok THEN 'bad_caption' END AS reject_reason
        FROM v ORDER BY doc_id""")),

    // ---- Zipf rank-frequency fit per source (corpus-health smell
    //      test: natural text has slope ≈ -1 on the log-log head;
    //      generated/boilerplate corpora bend away). Milli-integer
    //      logs, truncating-div means, centered-sum micro slope ------
    Q("x123_zipf_fit",
      (s, dir) => graft.operators.ZipfFit.zipfReport(
        t(s, dir, "documents"), "text", "source", topK = 500)
        .orderBy(col("source")),
      Some("""WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS w
          FROM documents),
        cnt AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
        st AS (SELECT source, w, c,
            count(*) OVER (PARTITION BY source) AS src_types,
            sum(c) OVER (PARTITION BY source) AS src_tokens,
            row_number() OVER (PARTITION BY source
              ORDER BY c DESC, w) AS r
          FROM cnt),
        hd AS (SELECT *, CAST(round(ln(r)*1000) AS BIGINT) AS x,
            CAST(round(ln(c)*1000) AS BIGINT) AS y
          FROM st WHERE r <= 500),
        ctr AS (SELECT *, count(*) OVER (PARTITION BY source) AS n,
            sum(x) OVER (PARTITION BY source) AS sx,
            sum(y) OVER (PARTITION BY source) AS sy FROM hd),
        c2 AS (SELECT source, src_types, src_tokens, n,
            x - sx // n AS cx, y - sy // n AS cy,
            sx // n AS mx, sy // n AS my FROM ctr)
        SELECT source, CAST(min(src_types) AS BIGINT) AS n_types,
          CAST(min(src_tokens) AS BIGINT) AS n_tokens,
          CAST(count(*) AS BIGINT) AS k_used,
          CAST(CASE WHEN sum(cx*cx) > 0 THEN
            sum(cx*cy) * 1000000 // sum(cx*cx) END AS BIGINT)
            AS slope_micro,
          CAST(min(mx) AS BIGINT) AS mean_ln_rank_milli,
          CAST(min(my) AS BIGINT) AS mean_ln_count_milli
        FROM c2 GROUP BY source ORDER BY source""")),

    // ---- vocabulary coverage curve per source (tokenizer design):
    //      token-mass coverage of the top-V types at a DENSE grid of
    //      vocab sizes — the knee is where growing the vocab stops
    //      paying; n_types_used makes saturation visible ---------------
    Q("x124_vocab_coverage",
      (s, dir) => graft.operators.ZipfFit.vocabCoverage(
        t(s, dir, "documents"), "text", "source", Seq(5, 10, 20, 50))
        .orderBy(col("source"), col("v_threshold")),
      Some("""WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS w
          FROM documents),
        cnt AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
        ss AS (SELECT source, CAST(sum(c) AS BIGINT) AS src_tokens,
            CAST(count(*) AS BIGINT) AS src_types FROM cnt GROUP BY source),
        st AS (SELECT source, c, row_number() OVER (PARTITION BY source
            ORDER BY c DESC, w) AS r FROM cnt),
        b AS (SELECT source,
            CASE WHEN r <= 5 THEN 5 WHEN r <= 10 THEN 10
                 WHEN r <= 20 THEN 20 ELSE 50 END AS vt,
            CAST(sum(c) AS BIGINT) AS bt
          FROM st WHERE r <= 50 GROUP BY 1, 2),
        grid AS (SELECT ss.source, ss.src_tokens, ss.src_types, v
          FROM ss CROSS JOIN (SELECT unnest([5, 10, 20, 50]) AS v)),
        d AS (SELECT grid.source, grid.src_tokens, grid.src_types,
            grid.v AS v_threshold, coalesce(b.bt, 0) AS bt
          FROM grid LEFT JOIN b
            ON grid.source = b.source AND grid.v = b.vt)
        SELECT source, CAST(v_threshold AS BIGINT) AS v_threshold,
          CAST(least(v_threshold, src_types) AS BIGINT) AS n_types_used,
          CAST(sum(bt) OVER w AS BIGINT) AS tokens_covered,
          CAST(sum(bt) OVER w * 1000000 // src_tokens AS BIGINT)
            AS coverage_micro
        FROM d
        WINDOW w AS (PARTITION BY source ORDER BY v_threshold
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY source, v_threshold""")),

    // ---- source semantic-similarity matrix: pairwise cosine between
    //      per-source centroid embeddings — the mix-design companion to
    //      lexical overlap (x60) and drift (x78): near-identical
    //      centroids = redundant sources, an outlier centroid = the
    //      diversity a source brings. Decimal-exact centroid means
    //      (x83's contract), groups×groups join on a GROUPS-sized frame -
    Q("x125_source_similarity",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
          .filter(size(col("embedding")) === 64)
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
        graft.operators.SourceSimilarity.centroidSimilarity(
          e.join(d, e("vec_id") === d("doc_id"))
            .select(col("source"), col("embedding")),
          "source", "embedding")
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH j AS (SELECT d.source AS label, e.embedding
          FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
          WHERE len(e.embedding) = 64),
        pe AS (SELECT label, r.range AS pos,
          CAST(round(CAST(embedding[r.range+1] AS DOUBLE), 4)
            AS DECIMAL(18,4)) AS comp
          FROM j, range(64) r),
        ct AS (SELECT label, pos,
          floor((CAST(sum(comp) AS DOUBLE)/count(*)) * 1000000 + 0.5)
            / 1000000 AS c
          FROM pe GROUP BY label, pos),
        ca AS (SELECT label, list(c ORDER BY pos) AS centroid
          FROM ct GROUP BY label),
        sz AS (SELECT label, CAST(count(*) AS BIGINT) AS n
          FROM j GROUP BY label),
        w AS (SELECT ca.label, centroid, n FROM ca JOIN sz USING (label))
        SELECT a.label AS source_a, b.label AS source_b,
          a.n AS n_a, b.n AS n_b,
          round(list_sum(list_transform(range(64),
              i -> a.centroid[i+1]*b.centroid[i+1]))
            / (sqrt(list_sum(list_transform(range(64),
                i -> a.centroid[i+1]*a.centroid[i+1])))
             * sqrt(list_sum(list_transform(range(64),
                i -> b.centroid[i+1]*b.centroid[i+1])))), 4) AS cos
        FROM w a JOIN w b ON a.label < b.label
        ORDER BY source_a, source_b""")),

    // ---- retrieval evaluation (MRR / recall@k / NDCG@k, Järvelin &
    //      Kekäläinen TOIS'02): the x05 exact cosine retriever scored
    //      against group-membership relevance (same label) — the
    //      clustering-style eval needing no human qrels. Micro-integer
    //      metrics; position discounts are a k-sized integer table both
    //      engines derive identically ------------------------------------
    Q("x126_retrieval_eval",
      (s, dir) => {
        val e = t(s, dir, "embeddings").filter(size(col("embedding")) === 64)
        val runs = Similarity
          .bruteForceTopKBroadcast(e, e, "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("neighbor_id").as("doc_id"),
            col("rank"))
        graft.operators.RetrievalEval.groupRelevanceEval(
          e.select(col("vec_id"), col("label")), "vec_id", "label",
          runs, k = 10)
          .select(col("group").cast("long").as("label"), col("n_queries"),
            col("mrr_micro"), col("recall_micro"), col("ndcg_micro"))
          .orderBy(col("label"))
      },
      Some {
        val d = dotSql.format("q.embedding", "q.embedding", "c.embedding")
        val n = dotSql.format("embedding", "embedding", "embedding")
        s"""WITH e AS (SELECT vec_id, label, embedding, sqrt($n) AS nrm
            FROM embeddings WHERE len(embedding) = 64),
          p AS (SELECT q.vec_id AS query_id, q.label AS qg,
              c.vec_id AS doc_id, c.label AS dg,
              round($d / (q.nrm*c.nrm), 4) AS cos
            FROM e q JOIN e c ON q.vec_id <> c.vec_id),
          run AS (SELECT * FROM (SELECT *, row_number() OVER
              (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rank
            FROM p) WHERE rank <= 10),
          gs AS (SELECT label, count(*) AS gn FROM e GROUP BY label),
          qq AS (SELECT e.vec_id AS query_id, e.label AS qg,
              least(gs.gn - 1, 10) AS n_rel
            FROM e JOIN gs USING (label) WHERE gs.gn > 1),
          pq AS (SELECT run.query_id, qq.qg, qq.n_rel,
              min(CASE WHEN run.dg = qq.qg THEN run.rank END) AS first_rel,
              sum(CASE WHEN run.dg = qq.qg THEN 1 ELSE 0 END) AS n_hits,
              sum(CASE WHEN run.dg = qq.qg THEN
                CAST(round(1000000/log2(run.rank+1)) AS BIGINT)
                ELSE 0 END) AS dcg
            FROM run JOIN qq USING (query_id)
            GROUP BY run.query_id, qq.qg, qq.n_rel),
          sc AS (SELECT qg,
              coalesce(1000000 // first_rel, 0) AS rr,
              n_hits * 1000000 // n_rel AS rec,
              dcg * 1000000 // list_sum(list_transform(
                range(1, CAST(n_rel AS INT) + 1),
                i -> CAST(round(1000000/log2(i+1)) AS BIGINT))) AS nd
            FROM pq)
          SELECT CAST(qg AS BIGINT) AS label,
            CAST(count(*) AS BIGINT) AS n_queries,
            CAST(sum(rr) // count(*) AS BIGINT) AS mrr_micro,
            CAST(sum(rec) // count(*) AS BIGINT) AS recall_micro,
            CAST(sum(nd) // count(*) AS BIGINT) AS ndcg_micro
          FROM sc GROUP BY qg ORDER BY label"""
      }),

    // ---- C4 keep-one segment dedup (Raffel et al. JMLR'20 §2.2: drop
    //      all but ONE occurrence of a repeated span): globally-first
    //      occurrence by (doc, position) survives — the complement of
    //      x38's remove-ALL boilerplate stripping. Non-overlapping
    //      15-word segments; shuffles move md5+position only -----------
    Q("x127_keep_first_dedup",
      (s, dir) => SegmentDedup.keepFirst(t(s, dir, "documents"),
        "doc_id", "text", segWords = 15, minCount = 2L)
        .orderBy(col("doc_id")),
      Some("""WITH tt AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        sg AS (SELECT doc_id, ts,
               unnest(range((len(ts) + 14) // 15)) AS seg_idx FROM tt),
        h AS (SELECT doc_id, seg_idx,
              md5(array_to_string(
                list_slice(ts, seg_idx*15+1, seg_idx*15+15), ' ')) AS sh
              FROM sg),
        w AS (SELECT doc_id, seg_idx,
              row_number() OVER (PARTITION BY sh
                ORDER BY doc_id, seg_idx) AS rn,
              count(*) OVER (PARTITION BY sh) AS cnt FROM h),
        bad AS (SELECT doc_id, list_sort(list(seg_idx)) AS cuts
                FROM w WHERE cnt >= 2 AND rn > 1 GROUP BY doc_id),
        jn AS (SELECT tt.doc_id, ts, coalesce(cuts, []) AS cuts
               FROM tt LEFT JOIN bad USING (doc_id))
        SELECT doc_id,
          coalesce(array_to_string(list_transform(
            list_filter(range(len(ts)), j -> NOT list_contains(cuts, j // 15)),
            p -> ts[p+1]), ' '), '') AS clean_text,
          CAST((len(ts) + 14) // 15 AS BIGINT) AS n_segments,
          CAST(len(cuts) AS BIGINT) AS n_removed
        FROM jn ORDER BY doc_id""")),

    // ---- BLEU-2 pair verification (Papineni ACL'02): the x02 Jaccard
    //      near-dup candidates re-scored with clipped asymmetric n-gram
    //      precision + brevity penalty — blocking proposes, BLEU
    //      adjudicates. Integer clip/precision/geo-sqrt; only the bp
    //      exp goes through the x40 6dp-round discipline ---------------
    Q("x128_bleu_pair_qa",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        Bleu.scorePairs(pairs, docs, "doc_a", "doc_b", "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        tx AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        j AS (SELECT doc_a, doc_b, a.ts AS ta, b.ts AS tb FROM pr
              JOIN tx a ON doc_a = a.doc_id JOIN tx b ON doc_b = b.doc_id
              WHERE len(a.ts) >= 2),
        g AS (SELECT doc_a, doc_b, ta, tb,
              list_transform(range(len(ta)-1), i -> ta[i+1]||'_'||ta[i+2]) AS ba,
              list_transform(range(len(tb)-1), i -> tb[i+1]||'_'||tb[i+2]) AS bb
              FROM j),
        c AS (SELECT doc_a, doc_b, len(ta) AS len_a, len(tb) AS len_b,
              CAST(coalesce(list_sum(list_transform(list_distinct(ta), t ->
                least(len(list_filter(ta, x -> x = t)),
                      len(list_filter(tb, x -> x = t))))), 0) AS BIGINT) AS c1,
              CAST(coalesce(list_sum(list_transform(list_distinct(ba), t ->
                least(len(list_filter(ba, x -> x = t)),
                      len(list_filter(bb, x -> x = t))))), 0) AS BIGINT) AS c2
              FROM g),
        m AS (SELECT doc_a, doc_b, len_a, len_b,
              c1 * 1000000 // len_a AS p1_micro,
              c2 * 1000000 // (len_a - 1) AS p2_micro FROM c),
        f AS (SELECT *,
              CAST(floor(sqrt(CAST(p1_micro * p2_micro AS DOUBLE))) AS BIGINT)
                AS geo_micro,
              round(exp(least(0.0, 1.0 - CAST(len_b AS DOUBLE)/len_a)), 6)
                AS bp_6 FROM m)
        SELECT doc_a, doc_b, CAST(len_a AS BIGINT) AS len_a,
          CAST(len_b AS BIGINT) AS len_b,
          CAST(p1_micro AS BIGINT) AS p1_micro,
          CAST(p2_micro AS BIGINT) AS p2_micro, geo_micro, bp_6,
          round(bp_6 * geo_micro / 1e6, 6) AS bleu_6
        FROM f ORDER BY doc_a, doc_b""")),

    // ---- Heaps-law vocabulary growth per source (Heaps'78): V = K·N^β
    //      fitted on the (cum tokens, cum types) curve at power-of-two
    //      doc ranks — the third corpus-health leg beside the Zipf
    //      exponent (x123) and the coverage knee (x124) ----------------
    Q("x129_heaps_fit",
      (s, dir) => graft.operators.ZipfFit.heapsReport(
        t(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy(col("source")),
      Some("""WITH rr AS (SELECT source, doc_id, string_split(text,' ') AS ts,
            row_number() OVER (PARTITION BY source ORDER BY doc_id) AS dr
          FROM documents),
        cv AS (SELECT source, dr, len(ts) AS nt,
            sum(len(ts)) OVER (PARTITION BY source ORDER BY dr) AS ctok
          FROM rr),
        fw AS (SELECT source, w, min(dr) AS fr FROM (
            SELECT source, dr, unnest(ts) AS w FROM rr) GROUP BY source, w),
        nw AS (SELECT source, fr, count(*) AS nnw FROM fw GROUP BY source, fr),
        cy AS (SELECT cv.source, cv.dr, cv.ctok,
            sum(coalesce(nw.nnw, 0)) OVER (PARTITION BY cv.source
              ORDER BY cv.dr) AS ctyp,
            max(cv.dr) OVER (PARTITION BY cv.source) AS last_dr
          FROM cv LEFT JOIN nw ON cv.source = nw.source AND cv.dr = nw.fr),
        pts AS (SELECT source, dr, ctok, ctyp, last_dr,
            CAST(round(ln(ctok)*1000) AS BIGINT) AS x,
            CAST(round(ln(ctyp)*1000) AS BIGINT) AS y
          FROM cy WHERE (dr & (dr-1)) = 0 OR dr = last_dr),
        ctr AS (SELECT *, count(*) OVER (PARTITION BY source) AS n,
            sum(x) OVER (PARTITION BY source) AS sx,
            sum(y) OVER (PARTITION BY source) AS sy FROM pts),
        c2 AS (SELECT source, last_dr, ctok, ctyp, n,
            x - sx // n AS cx, y - sy // n AS cyy,
            sx // n AS mx, sy // n AS my FROM ctr)
        SELECT source, CAST(max(last_dr) AS BIGINT) AS n_docs,
          CAST(max(ctok) AS BIGINT) AS n_tokens,
          CAST(max(ctyp) AS BIGINT) AS n_types,
          CAST(count(*) AS BIGINT) AS k_points,
          CAST(CASE WHEN sum(cx*cx) > 0 THEN
            sum(cx*cyy) * 1000000 // sum(cx*cx) END AS BIGINT) AS beta_micro,
          CAST(CASE WHEN sum(cx*cx) > 0 THEN
            min(my) - (sum(cx*cyy) * 1000000 // sum(cx*cx)) * min(mx) // 1000000
            END AS BIGINT) AS ln_k_milli
        FROM c2 GROUP BY source ORDER BY source""")),

    // ---- audio resample (decimate-by-2 with a 2-tap box anti-alias
    //      filter): REAL WAV decode → filter → re-encode, map-side where
    //      the bytes live. The fixture pins every decimation frame
    //      inside one half-period (halfp even, frames aligned), so the
    //      output is exactly the ±amp square wave at half rate and
    //      peak/energy are CLOSED-FORM integers the oracle replays -----
    Q("x130_audio_resample",
      (s, dir) => {
        val spec = t(s, dir, "documents").select(col("doc_id"),
          element_at(typedlit(Seq(8000, 16000, 44100)),
            (col("doc_id") % 3).cast("int") + 1).as("rate"),
          (lit(2) * (lit(300) + pmod(col("doc_id") * 7 + col("n_chars"),
            lit(400)))).cast("int").as("n"),
          (lit(500) + pmod(col("doc_id") * 13, lit(30)) * 1000)
            .cast("int").as("amp"),
          (lit(2) * (lit(2) + pmod(col("doc_id"), lit(12))))
            .cast("int").as("halfp"),
          lit(0).as("q"), lit(0).as("r"))
        // map-side synth over a pre-sorted spec (see x117/x121): no
        // per-sample interpreted HOF, no trailing orderBy double-eval
        val ordered = spec.repartitionByRange(col("doc_id"))
          .sortWithinPartitions("doc_id")
        val withSamples = Audio.synthSquare(s, ordered)
        val packed = Audio.packWav(s, withSamples, "doc_id", "rate",
          "samples").toDF()
          .withColumn("payload", when(col("id") % 97 === 0,
            expr("substring(payload, 1, 6)")).otherwise(col("payload")))
        Audio.resample(s, packed, factor = 2).toDF()
          .select(col("id"), col("resampled"), col("rate_in"),
            col("rate_out"), col("n_in"), col("n_out"), col("peak_out"),
            col("sum_sq_out"), col("duration_out_ms"), col("n_bytes"))
      },
      Some("""WITH s AS (SELECT doc_id AS id,
          CASE WHEN doc_id % 3 = 0 THEN 8000
               WHEN doc_id % 3 = 1 THEN 16000 ELSE 44100 END AS rate,
          2*(300 + (doc_id*7 + n_chars) % 400) AS n,
          500 + (doc_id*13) % 30 * 1000 AS amp
        FROM documents)
        SELECT id, id % 97 <> 0 AS resampled,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(rate AS BIGINT) END AS rate_in,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(rate // 2 AS BIGINT) END AS rate_out,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(n AS BIGINT) END AS n_in,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(n // 2 AS BIGINT) END AS n_out,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(amp AS BIGINT) END AS peak_out,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST(n // 2 AS BIGINT) * amp * amp END AS sum_sq_out,
          CASE WHEN id % 97 = 0 THEN NULL
               ELSE CAST((n // 2) * 1000 // (rate // 2) AS BIGINT)
               END AS duration_out_ms,
          CASE WHEN id % 97 = 0 THEN CAST(6 AS BIGINT)
               ELSE CAST(44 + 2*(n // 2) AS BIGINT) END AS n_bytes
        FROM s ORDER BY id""")),

    // ---- chrF2 pair verification (Popović WMT'15): character n-gram
    //      F-score over the x02/x128 candidate chain — the
    //      tokenization-free BLEU sibling; every score column is pure
    //      BIGINT micro arithmetic, hash-exact by construction ---------
    Q("x131_chrf_pair_qa",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        Chrf.scorePairs(pairs, docs, "doc_a", "doc_b", "doc_id", "text")
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        tx AS (SELECT doc_id, regexp_replace(text, '\\s+', '', 'g') AS cs
               FROM documents),
        j AS (SELECT doc_a, doc_b, a.cs AS sa, b.cs AS sb FROM pr
              JOIN tx a ON doc_a = a.doc_id JOIN tx b ON doc_b = b.doc_id
              WHERE len(a.cs) >= 3 AND len(b.cs) >= 3),
        g AS (SELECT doc_a, doc_b, len(sa) AS len_a, len(sb) AS len_b,
              list_transform(range(len(sa)), i -> substr(sa, i+1, 1)) AS ga1,
              list_transform(range(len(sb)), i -> substr(sb, i+1, 1)) AS gb1,
              list_transform(range(len(sa)-1), i -> substr(sa, i+1, 2)) AS ga2,
              list_transform(range(len(sb)-1), i -> substr(sb, i+1, 2)) AS gb2,
              list_transform(range(len(sa)-2), i -> substr(sa, i+1, 3)) AS ga3,
              list_transform(range(len(sb)-2), i -> substr(sb, i+1, 3)) AS gb3
              FROM j),
        c AS (SELECT doc_a, doc_b, len_a, len_b,
              CAST(coalesce(list_sum(list_transform(list_distinct(ga1), t ->
                least(len(list_filter(ga1, x -> x = t)),
                      len(list_filter(gb1, x -> x = t))))), 0) AS BIGINT) AS ov_1,
              CAST(coalesce(list_sum(list_transform(list_distinct(ga2), t ->
                least(len(list_filter(ga2, x -> x = t)),
                      len(list_filter(gb2, x -> x = t))))), 0) AS BIGINT) AS ov_2,
              CAST(coalesce(list_sum(list_transform(list_distinct(ga3), t ->
                least(len(list_filter(ga3, x -> x = t)),
                      len(list_filter(gb3, x -> x = t))))), 0) AS BIGINT) AS ov_3
              FROM g),
        m AS (SELECT *,
              ov_1 * 1000000 // len_a AS p1, ov_1 * 1000000 // len_b AS r1,
              ov_2 * 1000000 // (len_a - 1) AS p2,
              ov_2 * 1000000 // (len_b - 1) AS r2,
              ov_3 * 1000000 // (len_a - 2) AS p3,
              ov_3 * 1000000 // (len_b - 2) AS r3 FROM c),
        f AS (SELECT doc_a, doc_b, len_a, len_b, ov_1, ov_2, ov_3,
              CASE WHEN 4*p1 + r1 = 0 THEN 0
                   ELSE 5*p1*r1 // (4*p1 + r1) END AS f1_micro,
              CASE WHEN 4*p2 + r2 = 0 THEN 0
                   ELSE 5*p2*r2 // (4*p2 + r2) END AS f2_micro,
              CASE WHEN 4*p3 + r3 = 0 THEN 0
                   ELSE 5*p3*r3 // (4*p3 + r3) END AS f3_micro FROM m)
        SELECT doc_a, doc_b, CAST(len_a AS BIGINT) AS len_a,
          CAST(len_b AS BIGINT) AS len_b, ov_1, ov_2, ov_3,
          CAST(f1_micro AS BIGINT) AS f1_micro,
          CAST(f2_micro AS BIGINT) AS f2_micro,
          CAST(f3_micro AS BIGINT) AS f3_micro,
          CAST((f1_micro + f2_micro + f3_micro) // 3 AS BIGINT) AS chrf_micro
        FROM f ORDER BY doc_a, doc_b""")),

    // ---- interpolated Kneser-Ney bigram LM (Kneser-Ney ICASSP'95,
    //      Chen-Goodman TR-10-98, D = 3/4): the production-grade
    //      smoothing upgrade of x40's add-one proxy — continuation
    //      probabilities back off by context DIVERSITY, not frequency;
    //      each bigram's probability is an exact BIGINT rational -------
    Q("x132_kneser_ney_nll",
      (s, dir) => graft.operators.LmScore.kneserNeyNll(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS ts
               FROM documents),
        bg AS (SELECT doc_id, ts[i+1] AS w1, ts[i+2] AS w2
               FROM (SELECT doc_id, ts, unnest(range(len(ts)-1)) AS i FROM t)),
        bi AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        ctx AS (SELECT w1, sum(c2) AS c1, count(*) AS n1p FROM bi GROUP BY w1),
        ends AS (SELECT w2, count(*) AS nend FROM bi GROUP BY w2),
        ty AS (SELECT count(*) AS tt FROM bi),
        sc AS (SELECT doc_id,
               CAST(round(ln(
                 CAST((4*bi.c2 - 3)*ty.tt + 3*ctx.n1p*ends.nend AS DOUBLE) /
                 CAST(4*ctx.c1*ty.tt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp
               FROM bg JOIN bi USING (w1, w2) JOIN ctx USING (w1)
                 JOIN ends USING (w2) CROSS JOIN ty)
        SELECT doc_id, count(*) AS n_bigrams,
          floor((-(CAST(sum(lp) AS DOUBLE) / count(*))) * 10000 + 0.5)
            / 10000 AS avg_nll
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // ---- Fellegi-Sunter probabilistic record linkage (JASA 1969):
    //      entity resolution over STRUCTURED records — blocked candidate
    //      join + pinned integer micro log-weights, thresholded into
    //      match/possible/non_match. The right side is a deterministic
    //      perturbed twin of customer (case flips, segment loss, balance
    //      drift), so the oracle replays end to end. Balance tiers use a
    //      +100000-shift before integer division: cents go negative and
    //      Spark's div truncates toward zero while DuckDB's // floors --
    Q("x133_record_linkage",
      (s, dir) => {
        import graft.operators.RecordLinkage
        import graft.operators.RecordLinkage.FieldWeight
        val c = t(s, dir, "customer").select(
          col("c_custkey").as("cid"), col("c_nationkey"),
          substring(col("c_name"), 10, 7).as("blk"),
          col("c_name").as("name"), col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
        val pert = c.select(col("cid"), col("c_nationkey"), col("blk"),
          when(col("cid") % 3 === 0, upper(col("name")))
            .otherwise(col("name")).as("name"),
          when(col("cid") % 6 === 0, lit("UNKNOWN"))
            .otherwise(col("seg")).as("seg"),
          (col("cents") + when(col("cid") % 7 === 0, lit(50L))
            .otherwise(lit(0L))).as("cents"))
        val fields = Seq(
          FieldWeight("name", col("name_l") === col("name_r"),
            2944439L, -2944439L),                   // m=.95 u=.05
          FieldWeight("seg", col("seg_l") === col("seg_r"),
            1504077L, -2079442L),                   // m=.90 u=.20
          FieldWeight("bal",
            abs(col("cents_l") - col("cents_r")) <= 10,
            3860730L, -2975530L),                   // m=.95 u=.02
          FieldWeight("tier",
            expr("(cents_l + 100000) div 100000") ===
              expr("(cents_r + 100000) div 100000"),
            2197225L, -2197225L))                   // m=.90 u=.10
        RecordLinkage.linkScored(c, pert, "cid",
          Seq("c_nationkey", "blk"), fields,
          upperMicro = 5000000L, lowerMicro = 0L)
          .orderBy(col("id_l"), col("id_r"))
      },
      Some("""WITH c AS (SELECT c_custkey AS cid, c_nationkey,
          substr(c_name, 10, 7) AS blk, c_name AS name,
          c_mktsegment AS seg,
          CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        p AS (SELECT cid, c_nationkey, blk,
          CASE WHEN cid % 3 = 0 THEN upper(name) ELSE name END AS name,
          CASE WHEN cid % 6 = 0 THEN 'UNKNOWN' ELSE seg END AS seg,
          cents + CASE WHEN cid % 7 = 0 THEN 50 ELSE 0 END AS cents
          FROM c),
        j AS (SELECT l.cid AS id_l, r.cid AS id_r, l.name AS name_l,
          r.name AS name_r, l.seg AS seg_l, r.seg AS seg_r,
          l.cents AS cents_l, r.cents AS cents_r
          FROM c l JOIN p r
            ON l.c_nationkey = r.c_nationkey AND l.blk = r.blk),
        b AS (SELECT id_l, id_r,
          CASE WHEN name_l = name_r THEN 1 ELSE 0 END AS name_agree,
          CASE WHEN seg_l = seg_r THEN 1 ELSE 0 END AS seg_agree,
          CASE WHEN abs(cents_l - cents_r) <= 10 THEN 1 ELSE 0
            END AS bal_agree,
          CASE WHEN (cents_l + 100000) // 100000 =
                    (cents_r + 100000) // 100000 THEN 1 ELSE 0
            END AS tier_agree FROM j),
        sc AS (SELECT *,
          CASE WHEN name_agree = 1 THEN 2944439 ELSE -2944439 END
          + CASE WHEN seg_agree = 1 THEN 1504077 ELSE -2079442 END
          + CASE WHEN bal_agree = 1 THEN 3860730 ELSE -2975530 END
          + CASE WHEN tier_agree = 1 THEN 2197225 ELSE -2197225 END
            AS score_micro FROM b)
        SELECT id_l, id_r, name_agree, seg_agree, bal_agree, tier_agree,
          CAST(score_micro AS BIGINT) AS score_micro,
          CASE WHEN score_micro >= 5000000 THEN 'match'
               WHEN score_micro >= 0 THEN 'possible'
               ELSE 'non_match' END AS decision
        FROM sc ORDER BY id_l, id_r""")),

    // ---- ordered funnel (view -> click -> purchase, 72 h conversion
    //      window from entry): first-completion stage times via
    //      user-keyed min-aggs — no windows, no per-user sorts; the
    //      funnel chart's exact reach + step/overall conversion --------
    Q("x134_funnel",
      (s, dir) => graft.operators.Funnel.firstCompletion(s,
        t(s, dir, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowHours = 72)
        .orderBy(col("stage_idx")),
      Some("""WITH e AS (SELECT user_id AS u, ts, event_type AS et
               FROM events
               WHERE event_type IN ('view', 'click', 'purchase')),
        s1 AS (SELECT u, min(ts) AS t,
               min(ts) + INTERVAL 72 HOUR AS deadline
               FROM e WHERE et = 'view' GROUP BY u),
        s2 AS (SELECT e.u, min(e.ts) AS t, max(s1.deadline) AS deadline
               FROM e JOIN s1 ON e.u = s1.u
               WHERE e.et = 'click' AND e.ts > s1.t
                 AND e.ts <= s1.deadline
               GROUP BY e.u),
        s3 AS (SELECT e.u, min(e.ts) AS t
               FROM e JOIN s2 ON e.u = s2.u
               WHERE e.et = 'purchase' AND e.ts > s2.t
                 AND e.ts <= s2.deadline
               GROUP BY e.u),
        n AS (SELECT 1 AS stage_idx, 'view' AS stage,
                count(*) AS n_users FROM s1
              UNION ALL SELECT 2, 'click', count(*) FROM s2
              UNION ALL SELECT 3, 'purchase', count(*) FROM s3),
        t1 AS (SELECT n_users AS n_top FROM n WHERE stage_idx = 1)
        SELECT n.stage_idx, n.stage, CAST(n.n_users AS BIGINT) AS n_users,
          CAST(CASE WHEN coalesce(p.n_users, n.n_users) > 0
               THEN n.n_users * 1000000 // coalesce(p.n_users, n.n_users)
               ELSE 0 END AS BIGINT) AS conv_vs_prev_micro,
          CAST(CASE WHEN t1.n_top > 0
               THEN n.n_users * 1000000 // t1.n_top
               ELSE 0 END AS BIGINT) AS conv_vs_top_micro
        FROM n LEFT JOIN n p ON n.stage_idx = p.stage_idx + 1
        CROSS JOIN t1 ORDER BY n.stage_idx""")),

    // ---- weekly cohort retention (the growth-dashboard triangle):
    //      cohort = Monday-start week of a user's first event; cell
    //      (cohort, k) = users active in offset week k ------------------
    Q("x135_cohort_retention",
      (s, dir) => graft.operators.Retention.weeklyCohorts(
        t(s, dir, "events"), "user_id", "ts")
        .orderBy(col("cohort_week"), col("week_offset")),
      Some("""WITH f AS (SELECT user_id AS u,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
               FROM events GROUP BY user_id),
        a AS (SELECT DISTINCT user_id AS u,
               CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        sz AS (SELECT cohort_week, count(*) AS cohort_size
               FROM f GROUP BY cohort_week),
        m AS (SELECT f.cohort_week,
               CAST(datediff('day', f.cohort_week, a.week) // 7 AS INT)
                 AS week_offset,
               count(*) AS n_active
               FROM a JOIN f ON a.u = f.u
               GROUP BY f.cohort_week, 2)
        SELECT CAST(m.cohort_week AS VARCHAR) AS cohort_week,
          m.week_offset, CAST(m.n_active AS BIGINT) AS n_active,
          CAST(m.n_active * 1000000 // sz.cohort_size AS BIGINT)
            AS retention_micro
        FROM m JOIN sz ON m.cohort_week = sz.cohort_week
        ORDER BY cohort_week, week_offset""")),

    // ---- shard rebalancing plan (Thaler-Ravishankar HRW/rendezvous
    //      vs naive mod-hash, 12 -> 16 shards): the movement matrix a
    //      100 TB re-partition quotes before touching data — HRW moves
    //      ONLY keys won by a new shard (~(M-N)/M); mod remaps nearly
    //      everything -------------------------------------------------
    Q("x136_shard_rebalance",
      (s, dir) => graft.operators.Sharding.rebalancePlan(
        t(s, dir, "documents"), "doc_id", nOld = 12, nNew = 16)
        .orderBy(col("strategy"), col("old_shard"), col("new_shard")),
      Some("""WITH ids AS (SELECT CAST(doc_id AS VARCHAR) AS id
               FROM documents),
        a AS (SELECT
          CAST(('0x' || substr(md5(id), 1, 8))::BIGINT % 12 AS INT)
            AS mod_old,
          CAST(('0x' || substr(md5(id), 1, 8))::BIGINT % 16 AS INT)
            AS mod_new,
          CAST(list_position(l12, list_aggregate(l12, 'max')) - 1 AS INT)
            AS hrw_old,
          CAST(list_position(l16, list_aggregate(l16, 'max')) - 1 AS INT)
            AS hrw_new
          FROM (SELECT id,
            list_transform(range(12),
              s -> md5(id || ':' || CAST(s AS VARCHAR))) AS l12,
            list_transform(range(16),
              s -> md5(id || ':' || CAST(s AS VARCHAR))) AS l16
            FROM ids)),
        m AS (SELECT 'mod' AS strategy, mod_old AS old_shard,
                mod_new AS new_shard FROM a
              UNION ALL
              SELECT 'hrw', hrw_old, hrw_new FROM a)
        SELECT strategy, old_shard, new_shard,
          CAST(count(*) AS BIGINT) AS n_rows,
          old_shard <> new_shard AS moved
        FROM m GROUP BY strategy, old_shard, new_shard
        ORDER BY strategy, old_shard, new_shard""")),

    // ---- join-skew profile of a LOW-CARDINALITY key (event_type into
    //      32 hash buckets): top keys by share, per-bucket load vs
    //      mean, and the max-bucket straggler factor — the diagnosis
    //      run before choosing broadcast/salting/AQE ------------------
    Q("x137_skew_profile",
      (s, dir) => graft.operators.Skew.keyProfile(
        t(s, dir, "events"), "event_type", partitions = 32, topK = 5)
        .orderBy(col("section"), col("item")),
      Some("""WITH c AS (SELECT CAST(event_type AS VARCHAR) AS k,
               count(*) AS n FROM events GROUP BY 1),
        t AS (SELECT sum(n) AS total FROM c),
        tk AS (SELECT 'key' AS section, k AS item, n AS n_rows,
               n * 1000000 // total AS metric_micro
               FROM c CROSS JOIN t ORDER BY n DESC, k LIMIT 5),
        b AS (SELECT ('0x' || substr(md5(k), 1, 8))::BIGINT % 32
                 AS bucket, sum(n) AS n FROM c GROUP BY 1),
        bk AS (SELECT 'bucket' AS section, CAST(bucket AS VARCHAR)
                 AS item, n AS n_rows,
               n * 32 * 1000000 // total AS metric_micro
               FROM b CROSS JOIN t),
        sm AS (SELECT 'summary' AS section, 'max_bucket_vs_mean' AS item,
               max(n_rows) AS n_rows, max(metric_micro) AS metric_micro
               FROM bk)
        SELECT section, item, CAST(n_rows AS BIGINT) AS n_rows,
          CAST(metric_micro AS BIGINT) AS metric_micro
        FROM (SELECT * FROM tk UNION ALL SELECT * FROM bk
              UNION ALL SELECT * FROM sm)
        ORDER BY section, item""")),

    // ---- hourly error-rate anomaly flags (trailing-24h z-test, z=3,
    //      min 12 baseline hours): the z^2 comparison multiplies
    //      through by c^2 so the WHOLE test is integer arithmetic —
    //      engine-exact flags, no doubles --------------------------
    Q("x138_rate_anomalies",
      (s, dir) => graft.operators.Anomaly.hourlyRateSpikes(
        t(s, dir, "events"), "ts", "event_type", "error")
        .orderBy(col("hour")),
      Some(hourlyAnomalySql)),

    // ---- embedding-space geometry: per-label per-dim mean/variance +
    //      the anisotropy ratio ||mu||^2 / E||x||^2 — every element
    //      quantized to the 1e-4 grid FIRST, then pure BIGINT two-pass
    //      variance (S2 reconstructed exactly from the centered SS) --
    Q("x139_embedding_geometry",
      (s, dir) => graft.operators.EmbeddingGeometry.report(
        t(s, dir, "embeddings"), "embedding", "label")
        .orderBy(col("label"), col("dim")),
      Some("""WITH x AS (SELECT label, CAST(i AS BIGINT) AS dim,
          CAST(round(CAST(embedding[i+1] AS DOUBLE) * 10000) AS BIGINT)
            AS e
          FROM embeddings, unnest(range(len(embedding))) AS u(i)),
        p1 AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n_vecs,
            CAST(sum(e) AS BIGINT) AS s1 FROM x GROUP BY 1, 2),
        p1m AS (SELECT *, s1 // n_vecs AS m FROM p1),
        st AS (SELECT x.label, x.dim, p.n_vecs, p.s1, p.m,
            CAST(sum((x.e - p.m) * (x.e - p.m)) AS BIGINT) AS ss
          FROM x JOIN p1m p ON x.label = p.label AND x.dim = p.dim
          GROUP BY 1, 2, 3, 4, 5),
        st2 AS (SELECT *, ss + 2 * m * s1 - n_vecs * m * m AS s2
          FROM st),
        d AS (SELECT label, dim, n_vecs, m AS mean_e4,
            ss // n_vecs AS var_e8, CAST(NULL AS BIGINT) AS aniso_micro
          FROM st2),
        g AS (SELECT label, CAST(-1 AS BIGINT) AS dim,
            max(n_vecs) AS n_vecs, CAST(NULL AS BIGINT) AS mean_e4,
            CAST(NULL AS BIGINT) AS var_e8,
            CASE WHEN sum(s2) // max(n_vecs) > 0
              THEN sum(m * m) * 1000000 // (sum(s2) // max(n_vecs))
              ELSE 0 END AS aniso_micro
          FROM st2 GROUP BY 1)
        SELECT label, dim, n_vecs, CAST(mean_e4 AS BIGINT) AS mean_e4,
          CAST(var_e8 AS BIGINT) AS var_e8,
          CAST(aniso_micro AS BIGINT) AS aniso_micro
        FROM (SELECT * FROM d UNION ALL SELECT * FROM g)
        ORDER BY label, dim""")),

    // ---- ANALYZE-style column profile of lineitem: counts, exact NDV,
    //      native-order min/max, avg rendered length, modal value —
    //      floats pre-quantized to cents (double-to-string is the one
    //      non-portable rendering; everything else is) ---------------
    Q("x140_column_profile",
      (s, dir) => graft.operators.Profiler.profile(
        t(s, dir, "lineitem"), Seq(
          "l_orderkey" -> col("l_orderkey"),
          "l_linenumber" -> col("l_linenumber"),
          "l_extendedprice_cents" ->
            round(col("l_extendedprice") * 100).cast("long"),
          "l_returnflag" -> col("l_returnflag"),
          "l_linestatus" -> col("l_linestatus"),
          "l_shipdate" -> col("l_shipdate")))
        .orderBy(col("column_name")),
      Some("""WITH s AS (
          SELECT 'l_orderkey' AS column_name,
            CAST(l_orderkey AS VARCHAR) AS value FROM lineitem
          UNION ALL SELECT 'l_linenumber',
            CAST(l_linenumber AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_extendedprice_cents',
            CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)
            FROM lineitem
          UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
          UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
          UNION ALL SELECT 'l_shipdate',
            CAST(l_shipdate AS VARCHAR) FROM lineitem),
        mm AS (
          SELECT 'l_orderkey' AS column_name,
            CAST(min(l_orderkey) AS VARCHAR) AS min_value,
            CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM lineitem
          UNION ALL SELECT 'l_linenumber',
            CAST(min(l_linenumber) AS VARCHAR),
            CAST(max(l_linenumber) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_extendedprice_cents',
            CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS VARCHAR),
            CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_returnflag', min(l_returnflag),
            max(l_returnflag) FROM lineitem
          UNION ALL SELECT 'l_linestatus', min(l_linestatus),
            max(l_linestatus) FROM lineitem
          UNION ALL SELECT 'l_shipdate', CAST(min(l_shipdate) AS VARCHAR),
            CAST(max(l_shipdate) AS VARCHAR) FROM lineitem),
        g AS (SELECT column_name, value, CAST(count(*) AS BIGINT) AS c
          FROM s GROUP BY 1, 2),
        r AS (SELECT column_name, CAST(sum(c) AS BIGINT) AS n_rows,
            CAST(coalesce(sum(c) FILTER (WHERE value IS NULL), 0)
              AS BIGINT) AS n_null,
            CAST(count(*) FILTER (WHERE value IS NOT NULL) AS BIGINT)
              AS n_distinct,
            CAST(CASE WHEN count(*) FILTER (WHERE value IS NOT NULL) > 0
              THEN sum(c * length(value)) * 1000000 //
                (sum(c) - coalesce(sum(c) FILTER (WHERE value IS NULL), 0))
              ELSE 0 END AS BIGINT) AS avg_len_micro
          FROM g GROUP BY 1),
        mx AS (SELECT column_name, max(c) AS maxc FROM g
          WHERE value IS NOT NULL GROUP BY 1),
        md AS (SELECT g.column_name, min(g.value) AS mode_value,
            CAST(max(g.c) AS BIGINT) AS mode_count
          FROM g JOIN mx ON g.column_name = mx.column_name
            AND g.c = mx.maxc
          WHERE g.value IS NOT NULL GROUP BY 1)
        SELECT r.column_name, r.n_rows, r.n_null, r.n_distinct,
          mm.min_value, mm.max_value, r.avg_len_micro, md.mode_value,
          coalesce(md.mode_count, 0) AS mode_count
        FROM r JOIN mm USING (column_name)
        LEFT JOIN md USING (column_name)
        ORDER BY column_name""")),

    // ---- market-basket brand pairs: Apriori 2-itemsets over orders
    //      (baskets = orders, items = part brands via the broadcast dim
    //      join) — support/confidence/lift in truncating micro --------
    Q("x141_frequent_pairs",
      (s, dir) => graft.operators.Baskets.frequentPairs(
        t(s, dir, "lineitem").join(
          broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand")),
        "l_orderkey", "p_brand")
        .orderBy(col("item1"), col("item2")),
      Some("""WITH b AS (SELECT DISTINCT l.l_orderkey AS bk,
            p.p_brand AS it
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        n AS (SELECT count(DISTINCT bk) AS nb FROM b),
        ic AS (SELECT it, CAST(count(*) AS BIGINT) AS c
          FROM b GROUP BY 1),
        f AS (SELECT * FROM ic WHERE c >= 2),
        bf AS (SELECT b.bk, b.it, f.c FROM b JOIN f ON b.it = f.it),
        p2 AS (SELECT l.it AS item1, r.it AS item2, l.c AS c1,
            r.c AS c2, CAST(count(*) AS BIGINT) AS pair_count
          FROM bf l JOIN bf r ON l.bk = r.bk AND l.it < r.it
          GROUP BY 1, 2, 3, 4)
        SELECT item1, item2, c1, c2, pair_count,
          pair_count * 1000000 // nb AS support_micro,
          pair_count * 1000000 // c1 AS conf12_micro,
          pair_count * 1000000 // c2 AS conf21_micro,
          (pair_count * 1000000 // c1) * nb // c2 AS lift_micro
        FROM p2 CROSS JOIN n
        WHERE pair_count * 1000000 // nb >= 10000
        ORDER BY item1, item2""")),

    // ---- first-order Markov transition matrix over the clickstream:
    //      session-gap-bounded consecutive pairs per user, row-
    //      normalized probabilities in truncating micro ---------------
    Q("x142_event_transitions",
      (s, dir) => graft.operators.Transitions.matrix(
        t(s, dir, "events"), "user_id", "ts", "event_id", "event_type")
        .orderBy(col("from_type"), col("to_type")),
      Some("""WITH x AS (SELECT user_id, event_type AS from_type,
            lead(event_type) OVER w AS to_type,
            epoch_us(ts) AS us, lead(epoch_us(ts)) OVER w AS to_us
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        tr AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
          FROM x
          WHERE to_type IS NOT NULL AND to_us - us <= 1800000000
          GROUP BY 1, 2),
        tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_total
          FROM tr GROUP BY 1)
        SELECT tr.from_type, tr.to_type, tr.n, tot.from_total,
          tr.n * 1000000 // tot.from_total AS prob_micro
        FROM tr JOIN tot USING (from_type)
        ORDER BY from_type, to_type""")),

    // ---- triangle census of the cosine near-dup graph: degree-ordered
    //      orientation (wedges at each triangle's smallest corner,
    //      O(sqrt m) out-degrees), per-node clustering coefficient —
    //      low cc on a high-degree node = hub false positive ----------
    Q("x143_dup_graph_triangles",
      (s, dir) => graft.operators.Triangles.perNode(
        Dedup.embeddingNearDups(t(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.35),
        "id_a", "id_b")
        .orderBy(col("id")),
      Some {
        val d = dotSql.format("a.embedding", "a.embedding", "b.embedding")
        val n = dotSql.format("embedding", "embedding", "embedding")
        s"""WITH e0 AS (SELECT vec_id, embedding, sqrt($n) AS nrm
              FROM embeddings),
          ed AS (SELECT a.vec_id AS a, b.vec_id AS b
            FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
            WHERE round($d / (a.nrm * b.nrm), 4) >= 0.35),
          deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT a AS id FROM ed UNION ALL SELECT b FROM ed)
            GROUP BY 1),
          o AS (SELECT
              CASE WHEN (da.degree, ed.a) < (db.degree, ed.b)
                THEN ed.a ELSE ed.b END AS src,
              CASE WHEN (da.degree, ed.a) < (db.degree, ed.b)
                THEN db.degree ELSE da.degree END AS dd,
              CASE WHEN (da.degree, ed.a) < (db.degree, ed.b)
                THEN ed.b ELSE ed.a END AS did
            FROM ed JOIN deg da ON ed.a = da.id
              JOIN deg db ON ed.b = db.id),
          wd AS (SELECT w1.src AS u, w1.did AS v, w2.did AS w
            FROM o w1 JOIN o w2 ON w1.src = w2.src
              AND (w1.dd, w1.did) < (w2.dd, w2.did)),
          tr AS (SELECT u, v, w FROM wd
            JOIN o ON wd.v = o.src AND wd.w = o.did),
          c AS (SELECT id, CAST(count(*) AS BIGINT) AS triangles
            FROM (SELECT u AS id FROM tr UNION ALL SELECT v FROM tr
                  UNION ALL SELECT w FROM tr) GROUP BY 1)
          SELECT deg.id, deg.degree,
            coalesce(c.triangles, 0) AS triangles,
            CASE WHEN deg.degree >= 2
              THEN 2 * coalesce(c.triangles, 0) * 1000000 //
                (deg.degree * (deg.degree - 1))
              ELSE 0 END AS cc_micro
          FROM deg LEFT JOIN c USING (id) ORDER BY id"""
      }),

    // ---- robust per-source length outliers: exact integer lower
    //      median + MAD from count tables — the heavy-tail-safe flag a
    //      mean/sigma score drowns on (one boilerplate page moves the
    //      mean by itself; it cannot move the median) -----------------
    Q("x144_robust_outliers",
      (s, dir) => graft.operators.RobustStats.madOutliers(
        t(s, dir, "documents"), "doc_id", "source",
        "n_chars").orderBy(col("id")),
      Some("""WITH b AS (SELECT doc_id AS id, source AS grp,
            CAST(n_chars AS BIGINT) AS v FROM documents),
        ct AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
          FROM b GROUP BY 1, 2),
        tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n
          FROM ct GROUP BY 1),
        cum AS (SELECT grp, v, c, sum(c) OVER (PARTITION BY grp
            ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM ct),
        med AS (SELECT cum.grp, min(v) AS median
          FROM cum JOIN tot USING (grp)
          WHERE cum >= (n + 1) // 2 GROUP BY 1),
        dct AS (SELECT ct.grp, abs(ct.v - med.median) AS v,
            CAST(sum(ct.c) AS BIGINT) AS c
          FROM ct JOIN med USING (grp) GROUP BY 1, 2),
        dcum AS (SELECT grp, v, c, sum(c) OVER (PARTITION BY grp
            ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM dct),
        mad AS (SELECT dcum.grp, min(v) AS mad
          FROM dcum JOIN tot USING (grp)
          WHERE cum >= (n + 1) // 2 GROUP BY 1)
        SELECT b.id, b.grp, b.v, med.median, mad.mad,
          abs(b.v - med.median) > 3 * mad.mad AS flag
        FROM b JOIN med USING (grp) JOIN mad USING (grp)
        ORDER BY id""")),

    // ---- streaming twin of the x138 anomaly report: two AvailableNow
    //      runs append per-batch hourly partial counts to a ledger;
    //      counts are additive, so the merged ledger IS the batch
    //      hourly frame and the z-test reports identically ------------
    Q("x145_streaming_anomaly",
      (s, dir) => {
        import graft.engine._
        // event_id split (x72's shape) on purpose: the two runs then
        // contribute PARTIAL counts to the SAME hours, exercising the
        // cross-batch additive merge rather than disjoint hour ranges
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"))
        val split = ev.agg(expr("(min(event_id) + max(event_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("stranom_landing")
        val ckpt = wh.resolve("_graft_checkpoints/stranom")
        s.sql("CREATE DATABASE IF NOT EXISTS stranom")
        s.sql("DROP TABLE IF EXISTS stranom.hourly")
        for (p <- Seq(landing, ckpt, wh.resolve("stranom.db/hourly")))
          Materializer.deleteRecursively(p)
        ev.filter(col("event_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
        EventStreams.streamingHourlyLedger(s, landing.toString, ev.schema,
          "stranom.hourly", ckpt.toString, "ts", "event_type", "error")
        ev.filter(col("event_id") > split)
          .write.mode("append").parquet(landing.toString)
        EventStreams.streamingHourlyLedger(s, landing.toString, ev.schema,
          "stranom.hourly", ckpt.toString, "ts", "event_type", "error")
        // mergeHourlyLedger, not a bare groupBy-sum: collapses
        // at-least-once replays on batch_id before summing
        graft.operators.Anomaly.spikesFromHourly(
          EventStreams.mergeHourlyLedger(s.table("stranom.hourly")))
          .orderBy(col("hour"))
      },
      Some(hourlyAnomalySql)),

    // ---- streaming-ledger COMPACTION end-to-end: the x145 feed run in
    //      THREE increments with a compaction between runs 2 and 3 — the
    //      batches-x-hours ledger collapses to one batch_id = -1 row set
    //      per hour plus the replay-eligible last batch kept verbatim
    //      (EventStreams.compactBatchLedger); the report off the
    //      compacted-then-extended ledger must STILL equal the one-shot
    //      batch SQL. At 100 TB this is what keeps the ledger scan cost
    //      bounded by distinct hours, not by microbatch count ----------
    Q("x153_ledger_compaction",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"))
        val bounds = ev.agg(expr("min(event_id)"), expr("max(event_id)"))
          .first()
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strcomp_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strcomp")
        s.sql("CREATE DATABASE IF NOT EXISTS strcomp")
        s.sql("DROP TABLE IF EXISTS strcomp.hourly")
        for (p <- Seq(landing, ckpt, wh.resolve("strcomp.db/hourly")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingHourlyLedger(s,
          landing.toString, ev.schema, "strcomp.hourly", ckpt.toString,
          "ts", "event_type", "error")
        ev.filter(col("event_id") <= c1)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        ev.filter(col("event_id") > c1 && col("event_id") <= c2)
          .write.mode("append").parquet(landing.toString)
        run()
        // compact between increments: batch 0 collapses into the
        // batch_id = -1 pre-merged rows, batch 1 stays verbatim; the
        // localCheckpoint pins the read before the same-table overwrite
        EventStreams.compactBatchLedger(s.table("strcomp.hourly"),
            Seq("hour"), Seq("n_events", "n_matched"))
          .localCheckpoint()
          .write.mode("overwrite").format("parquet")
          .saveAsTable("strcomp.hourly")
        ev.filter(col("event_id") > c2)
          .write.mode("append").parquet(landing.toString)
        run()
        graft.operators.Anomaly.spikesFromHourly(
          EventStreams.mergeHourlyLedger(s.table("strcomp.hourly")))
          .orderBy(col("hour"))
      },
      Some(hourlyAnomalySql)),

    // ---- long-key edit-distance self-join: the x89 fuzzy join over
    //      60-char document prefixes — deletion neighborhoods would blow
    //      up O(len²) variants per key here, so selfJoinHybrid routes
    //      long keys through PassJoin segment blocking (Li-Deng-Feng
    //      ICDE'11: d+1 segments, multi-match-aware probe windows,
    //      postings linear in key count). Planted 1-sub and 1-del twins
    //      guarantee true pairs; the oracle brute-forces levenshtein
    //      over the length-filtered pair set --------------------------
    Q("x154_editdist_long_keys",
      (s, dir) => {
        val base = t(s, dir, "documents").filter(col("doc_id") % 4 === 0)
          .select(col("doc_id"), expr("substring(text, 1, 60)").as("key"))
        val subTwin = base
          .filter(col("doc_id") % 20 === 0 && length(col("key")) >= 35)
          .select(expr(
            "concat(substring(key, 1, 30), 'q', substring(key, 32))")
            .as("key"))
        val delTwin = base
          .filter(col("doc_id") % 40 === 0 && length(col("key")) >= 20)
          .select(expr("concat(substring(key, 1, 10), substring(key, 12))")
            .as("key"))
        graft.operators.EditDistJoin.selfJoinHybrid(
          base.select("key").unionByName(subTwin).unionByName(delTwin),
          "key", maxDist = 2, maxKeyLen = 32)
          .orderBy(col("key_a"), col("key_b"))
      },
      Some("""WITH b AS (SELECT doc_id, substring(text, 1, 60) AS key
            FROM documents WHERE doc_id % 4 = 0 AND text IS NOT NULL),
        s1 AS (SELECT concat(substring(key,1,30),'q',substring(key,32))
              AS key FROM b WHERE doc_id % 20 = 0 AND length(key) >= 35),
        s2 AS (SELECT concat(substring(key,1,10), substring(key,12))
              AS key FROM b WHERE doc_id % 40 = 0 AND length(key) >= 20),
        k AS (SELECT DISTINCT key FROM (SELECT key FROM b UNION ALL
            SELECT key FROM s1 UNION ALL SELECT key FROM s2)),
        p AS (SELECT a.key AS key_a, b2.key AS key_b FROM k a JOIN k b2
            ON a.key < b2.key
            WHERE abs(length(a.key) - length(b2.key)) <= 2)
        SELECT key_a, key_b,
          CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
        FROM p WHERE levenshtein(key_a, key_b) <= 2
        ORDER BY key_a, key_b""")),

    // ---- token-BUDGETED per-source cap: pretraining mixes are
    //      specified in tokens, not documents — keep each source's
    //      longest docs while the source's running token total fits a
    //      600-token budget. NOT a per-source corpus window: the
    //      operator decomposes into a (source, priority) histogram,
    //      histogram-window cutoff classes, and a tie window over the
    //      single cutoff class (the x83 no-funnel rule) --------------
    Q("x155_token_budget_cap",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("tok", nTokens(tokens(col("text"))))
        graft.operators.Sampling.tokenBudgetCap(
          docs.withColumn("prio", col("tok")),
          "source", "doc_id", "prio", "tok", budget = 600)
          .select(col("source"), col("doc_id"), col("tok"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""WITH w AS (SELECT source, doc_id,
            CAST(len(string_split(text,' ')) AS BIGINT) AS tok
            FROM documents),
        -- null-token rows are excluded (the operator's documented
        -- contract; none exist in this corpus)
        nn AS (SELECT * FROM w WHERE tok IS NOT NULL),
        r AS (SELECT source, doc_id, tok,
            sum(tok) OVER (PARTITION BY source ORDER BY tok DESC, doc_id
              ROWS UNBOUNDED PRECEDING) AS cum FROM nn)
        SELECT source, doc_id, tok FROM r WHERE cum <= 600
        ORDER BY source, doc_id""")),

    // ---- content-defined chunk dedup (LBFS boundary rule, SOSP'01):
    //      chunk every doc where a 16-char polynomial window hash hits
    //      residue 0 mod 64, md5 each chunk, and report per doc how
    //      many of its chunks occur >= 2 times corpus-wide — the
    //      shift-robust near-copy signal doc-level hashing (x01) is
    //      blind to (insert one char and every fixed window moves;
    //      content-defined boundaries re-synchronize). The corpus's
    //      planted near-dup twins light this up without any fixture
    //      fabrication. Zero-shuffle chunking; chunk-sized rows only
    //      cross the wire --------------------------------------------
    Q("x156_cdc_chunk_dedup",
      (s, dir) => graft.operators.Cdc.dupChunkReport(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, text,
            CAST(length(text) AS BIGINT) AS len FROM documents
            WHERE text IS NOT NULL AND length(text) >= 1),
        b AS (SELECT doc_id, text, len,
            CASE WHEN len >= 16 THEN
              list_filter(range(16, len + 1), i ->
                list_sum(list_transform(range(16), j ->
                  ascii(substring(text, CAST(i - 15 + j AS INTEGER), 1))
                    * ([122335, 748097, 903583, 198273, 107871, 307905, 618783, 290561, 77023, 408385, 317599, 923521, 29791, 961, 31, 1])[j + 1])) % 64 = 0)
            ELSE [] END AS bnds FROM t),
        sp AS (SELECT doc_id, text, len, bnds,
            unnest(range(1, CAST(len(bnds) + 2 AS BIGINT))) AS k FROM b),
        ch AS (SELECT doc_id,
            CASE WHEN k = 1 THEN 1 ELSE bnds[CAST(k - 1 AS INTEGER)] + 1
              END AS s,
            CASE WHEN k <= len(bnds) THEN bnds[CAST(k AS INTEGER)]
              ELSE len END AS e,
            text FROM sp),
        chk AS (SELECT doc_id, md5(substring(text, CAST(s AS INTEGER),
            CAST(e - s + 1 AS INTEGER))) AS h FROM ch WHERE e >= s),
        fr AS (SELECT h, count(*) AS c FROM chk GROUP BY h)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
          CAST(sum(CASE WHEN fr.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dup_chunks,
          CAST(sum(CASE WHEN fr.c >= 2 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS dup_ratio_micro
        FROM chk JOIN fr USING (h) GROUP BY doc_id ORDER BY doc_id""")),

    // ---- per-source exact quantile normalization: quality signals
    //      from different sources live on incomparable scales, so mix
    //      policies compare QUANTILES (the rank-transform step of
    //      Bolstad'03 quantile normalization, per group). rank is NOT a
    //      per-source corpus window (the x83 funnel): a (source, score)
    //      histogram cumulative + an id window over the single tie
    //      class — the x155 decomposition, proved equal to the plain
    //      window rank by the oracle -----------------------------------
    Q("x157_quantile_normalize",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .withColumn("score", nTokens(tokens(col("text"))))
        graft.operators.QuantileNorm.perGroup(docs,
          "source", "doc_id", "score")
          .orderBy(col("doc_id"))
      },
      Some("""WITH w AS (SELECT source, doc_id,
            CAST(len(string_split(text,' ')) AS BIGINT) AS score
            FROM documents),
        -- null-score rows are excluded (the operator's documented
        -- contract; none exist in this corpus)
        nn AS (SELECT * FROM w WHERE score IS NOT NULL),
        r AS (SELECT source, doc_id, score,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY score, doc_id) AS BIGINT) AS rank,
            count(*) OVER (PARTITION BY source) AS n FROM nn)
        SELECT source, doc_id, score, rank,
          CAST(rank * 1000000 // (n + 1) AS BIGINT) AS qnorm_micro
        FROM r ORDER BY doc_id""")),

    // ---- column-profile DRIFT between two time slices: the
    //      data-contract monitor — x140's profile run on the first and
    //      second halves of the event stream (split at the exact
    //      microsecond-epoch midpoint), diffed per column with integer
    //      micro tolerances. The uniform generator should read STABLE
    //      on the rate/length/cardinality axes; whatever it reads, the
    //      oracle replays the full profile+diff chain verbatim --------
    Q("x158_profile_drift",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val b = ev.agg(min(unix_micros(col("ts"))),
          max(unix_micros(col("ts")))).first()
        val split = (b.getLong(0) + b.getLong(1)) / 2
        def prof(d: org.apache.spark.sql.DataFrame) =
          graft.operators.Profiler.profile(d, Seq(
            "event_type" -> col("event_type"),
            "user_id" -> col("user_id"),
            "value_cents" -> round(col("value") * 100).cast("long")))
        graft.operators.Profiler.drift(
          prof(ev.filter(unix_micros(col("ts")) <= split)),
          prof(ev.filter(unix_micros(col("ts")) > split)))
          .orderBy(col("column_name"))
      },
      Some(profileDriftSql)),

    // ---- STREAMING column-profile drift: x158's data-contract monitor
    //      fed incrementally (the monitoring family's batch/streaming
    //      pairing — drift x78/x84, anomaly x138/x145, profile
    //      x158/x159). Two AvailableNow runs over event_id-parity
    //      increments (each increment carries BOTH time slices) append
    //      per-slice (column, value) count partials stamped with
    //      batch_id; counts are additive, so the merged ledger
    //      telescopes to the batch count table and the streamed drift
    //      equals x158's two-slice batch drift row-for-row — the oracle
    //      is x158's SQL verbatim --------------------------------------
    Q("x159_streaming_profile_drift",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"),
            col("user_id"), col("value"))
        val b = ev.agg(min(unix_micros(col("ts"))),
          max(unix_micros(col("ts")))).first()
        val split = (b.getLong(0) + b.getLong(1)) / 2
        val profCols = Seq(
          "event_type" -> col("event_type"),
          "user_id" -> col("user_id"),
          "value_cents" -> round(col("value") * 100).cast("long"))
        val slice = when(unix_micros(col("ts")) <= split, "a")
          .otherwise("b")
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strprof_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strprof")
        s.sql("CREATE DATABASE IF NOT EXISTS strprof")
        s.sql("DROP TABLE IF EXISTS strprof.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("strprof.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingProfileLedger(s,
          landing.toString, ev.schema, "strprof.ledger", ckpt.toString,
          profCols, slice)
        ev.filter(col("event_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        ev.filter(col("event_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        val merged = EventStreams.mergeProfileLedger(
          s.table("strprof.ledger"))
        graft.operators.Profiler.drift(
          graft.operators.Profiler.reportFromCounts(
            merged.filter(col("slice") === "a").drop("slice")),
          graft.operators.Profiler.reportFromCounts(
            merged.filter(col("slice") === "b").drop("slice")))
          .orderBy(col("column_name"))
      },
      Some(profileDriftSql)),

    // ---- INCREMENTAL CDC dedup: x50's ledger core over CONTENT-CHUNK
    //      signatures (x156's LBFS chunk hashes as postings), completing
    //      the incremental-signature matrix doc-hash/MinHash (x50) ×
    //      embedding (x56) × chunk (x160). A new doc is dropped iff it
    //      shares any qualifying (>= 32-char) content chunk with a kept
    //      historical doc or a smaller-id batch peer — shift-robust
    //      where the doc-hash ledger is blind; same cursor-prune proof
    //      as x50 (run 2 processes only docs past run 1's max id), same
    //      ledger schema/views/compactor (LedgerInvariantsSpec) --------
    Q("x160_incremental_cdc_dedup",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
        val split = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val staging = wh.resolve("incrcdc_staging")
        Materializer.deleteRecursively(staging)
        s.sql("DROP TABLE IF EXISTS incrcdc.cdc_ledger")
        Materializer.deleteRecursively(wh.resolve("incrcdc.db/cdc_ledger"))
        def freshProject(): Project = {
          val p = new Project(s, Target("dev", "incrcdc", threads = 2))
          p.source("raw", "docs", ParquetPath(staging.toString))
          p.model("cdc_ledger", ModelConfig(materialized =
            Materialization.Incremental(None,
              Materialization.IncrementalStrategy.Append))) { ctx =>
            val arrived = ctx.source("raw", "docs")
            val (batch, keptPosts) =
              if (ctx.isIncremental) {
                val cursor = ctx.thisDf.agg(max(col("doc"))).first().getLong(0)
                (arrived.filter(col("doc_id") > cursor),
                  ctx.thisDf.filter(col("kept") && col("band") >= 0))
              } else
                (arrived, graft.operators.Cdc.chunkPostings(
                  arrived.limit(0), "doc_id", "text"))
            graft.operators.Cdc.cdcDedupBatchLedger(batch, keptPosts,
              "doc_id", "text")
          }
          p
        }
        docs.filter(col("doc_id") <= split)
          .write.mode("overwrite").parquet(staging.toString)
        val r1 = freshProject().run(fullRefresh = true)
        require(r1.ok, s"incremental cdc dedup run 1 failed: ${r1.results}")
        docs.filter(col("doc_id") > split)
          .write.mode("append").parquet(staging.toString)
        val r2 = freshProject().run()
        require(r2.ok, s"incremental cdc dedup run 2 failed: ${r2.results}")
        s.table("incrcdc.cdc_ledger")
          .groupBy(col("doc"))
          .agg(max(col("kept")).as("kept"))
          .withColumn("batch",
            when(col("doc") <= split, 1L).otherwise(2L))
          .select(col("doc").as("doc_id"), col("kept"), col("batch"))
          .orderBy(col("doc_id"))
      },
      Some(cdcLedgerOracleSql)),

    // ---- STREAMING CDC dedup: x160's chunk-signature ledger with the
    //      file-source OFFSET LOG as the incremental cursor (two
    //      Trigger.AvailableNow runs over a landing dir; run 2's
    //      checkpoint skips run 1's files) — arrival order and id space
    //      are arbitrary, unlike x160's max-doc-id predicate. Identical
    //      oracle: the mechanisms must agree (the x50/x58 pairing,
    //      completing the batch/streaming x chunk cell) ----------------
    Q("x161_streaming_cdc_ledger",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
        val split = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2"))
          .first().getLong(0)
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strcdc_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strcdc")
        s.sql("CREATE DATABASE IF NOT EXISTS strcdc")
        s.sql("DROP TABLE IF EXISTS strcdc.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("strcdc.db/ledger")))
          Materializer.deleteRecursively(p)
        docs.filter(col("doc_id") <= split)
          .write.mode("overwrite").parquet(landing.toString)
        EventStreams.streamingCdcDedupLedger(s, landing.toString,
          docs.schema, "strcdc.ledger", ckpt.toString, "doc_id", "text")
        docs.filter(col("doc_id") > split)
          .write.mode("append").parquet(landing.toString)
        EventStreams.streamingCdcDedupLedger(s, landing.toString,
          docs.schema, "strcdc.ledger", ckpt.toString, "doc_id", "text")
        s.table("strcdc.ledger")
          .groupBy(col("doc"))
          .agg(max(col("kept")).as("kept"))
          .withColumn("batch",
            when(col("doc") <= split, 1L).otherwise(2L))
          .select(col("doc").as("doc_id"), col("kept"), col("batch"))
          .orderBy(col("doc_id"))
      },
      Some(cdcLedgerOracleSql)),

    // ---- STREAMING uniform-sample ledger: the x29 hash-rank sample
    //      maintained incrementally — each AvailableNow microbatch
    //      appends its own per-source md5-rank top-12 (windows over the
    //      bounded batch, never history); the rank key is a pure
    //      function of the id, so the merged top-12 equals the batch
    //      rule over everything ingested — the oracle is the plain x29
    //      window SQL. Rerun-stable eval slices that never reprocess
    //      the corpus ------------------------------------------------
    Q("x162_streaming_sample_ledger",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("strsamp_landing")
        val ckpt = wh.resolve("_graft_checkpoints/strsamp")
        s.sql("CREATE DATABASE IF NOT EXISTS strsamp")
        s.sql("DROP TABLE IF EXISTS strsamp.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("strsamp.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingSampleLedger(s,
          landing.toString, docs.schema, "strsamp.ledger", ckpt.toString,
          "source", "doc_id", n = 12)
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        EventStreams.mergeSampleLedger(s.table("strsamp.ledger"),
            "source", "doc_id", n = 12)
          .orderBy(col("source"), col("doc_id"))
      },
      Some("""SELECT source, doc_id FROM (
          SELECT source, doc_id, row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents)
        WHERE rk <= 12 ORDER BY source, doc_id""")),

    // ---- EXACT stratified split: hashSplit's (x22) exact-proportions
    //      twin — per source, EXACTLY floor(95% of n) rows to train
    //      (per-row probabilistic hashing can miss a small stratum's
    //      target badly; contractual eval holdouts need exact counts).
    //      NOT a per-source corpus window: md5-PREFIX buckets (a prefix
    //      of the sort key, so bucket order is coarse rank order) give
    //      a histogram, cumulative windows classify whole buckets, and
    //      only the single straddling bucket resolves by a window over
    //      that one slice — the x155/x157 threshold decomposition
    //      applied to the hash order itself ---------------------------
    Q("x163_stratified_split",
      (s, dir) => graft.operators.Sampling.stratifiedSplit(
        t(s, dir, "documents"), "source", "doc_id", fracMicro = 950000L)
        .orderBy(col("source"), col("doc_id")),
      Some("""WITH w AS (SELECT source, doc_id,
            row_number() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
            count(*) OVER (PARTITION BY source) AS n FROM documents)
        SELECT source, doc_id,
          CASE WHEN rk <= n * 950000 // 1000000 THEN 'train'
            ELSE 'holdout' END AS split
        FROM w ORDER BY source, doc_id""")),

    // ---- rolling active users (DAU / trailing-7 / trailing-28): EXACT
    //      rolling count-distinct via the bin-join idiom — each (user,
    //      day) contributes itself to the w report days it can appear
    //      in; distinct doesn't subtract, so sliding windows can't do
    //      this incrementally ----------------------------------------
    Q("x146_rolling_active",
      (s, dir) => graft.operators.Retention.rollingActive(
        t(s, dir, "events"), "user_id", "ts")
        .orderBy(col("day")),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u,
            CAST(ts AS DATE) AS d FROM events),
        days AS (SELECT DISTINCT d FROM ud),
        e1 AS (SELECT DISTINCT u, d + CAST(k AS INTEGER) AS d
          FROM ud CROSS JOIN unnest(range(0, 1)) AS t(k)),
        a1 AS (SELECT d, CAST(count(*) AS BIGINT) AS active_1
          FROM e1 GROUP BY 1),
        e7 AS (SELECT DISTINCT u, d + CAST(k AS INTEGER) AS d
          FROM ud CROSS JOIN unnest(range(0, 7)) AS t(k)),
        a7 AS (SELECT d, CAST(count(*) AS BIGINT) AS active_7
          FROM e7 GROUP BY 1),
        e28 AS (SELECT DISTINCT u, d + CAST(k AS INTEGER) AS d
          FROM ud CROSS JOIN unnest(range(0, 28)) AS t(k)),
        a28 AS (SELECT d, CAST(count(*) AS BIGINT) AS active_28
          FROM e28 GROUP BY 1)
        SELECT strftime(days.d, '%Y-%m-%d') AS day,
          coalesce(a1.active_1, 0) AS active_1,
          coalesce(a7.active_7, 0) AS active_7,
          coalesce(a28.active_28, 0) AS active_28
        FROM days LEFT JOIN a1 USING (d) LEFT JOIN a7 USING (d)
        LEFT JOIN a28 USING (d)
        ORDER BY day""")),

    // ---- golden-record survivorship: three perturbed member copies
    //      per customer cluster fuse by majority vote (vote strategy,
    //      Bleiholder-Naumann data-fusion taxonomy); n_values > 1 is
    //      the per-attribute conflict count ---------------------------
    Q("x147_golden_record",
      (s, dir) => {
        val c = t(s, dir, "customer").select(
          col("c_custkey").as("cluster"), col("c_name").as("name"),
          col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
        val pertB = c.select(col("cluster"),
          when(col("cluster") % 3 === 0, upper(col("name")))
            .otherwise(col("name")).as("name"),
          when(col("cluster") % 6 === 0, lit(null).cast("string"))
            .otherwise(col("seg")).as("seg"),
          col("cents"))
        val pertC = c.select(col("cluster"), col("name"), col("seg"),
          (col("cents") + when(col("cluster") % 7 === 0, lit(50L))
            .otherwise(lit(0L))).as("cents"))
        graft.operators.GoldenRecord.survivorship(
          c.unionByName(pertB).unionByName(pertC),
          "cluster", Seq("name", "seg", "cents"))
          .orderBy(col("cluster"), col("attr"))
      },
      Some("""WITH c AS (SELECT c_custkey AS cluster, c_name AS name,
            c_mktsegment AS seg,
            CAST(round(c_acctbal * 100) AS BIGINT) AS cents
          FROM customer),
        m AS (
          SELECT cluster, name, seg, CAST(cents AS VARCHAR) AS cents
          FROM c
          UNION ALL SELECT cluster,
            CASE WHEN cluster % 3 = 0 THEN upper(name) ELSE name END,
            CASE WHEN cluster % 6 = 0 THEN NULL ELSE seg END,
            CAST(cents AS VARCHAR) FROM c
          UNION ALL SELECT cluster, name, seg,
            CAST(cents + CASE WHEN cluster % 7 = 0 THEN 50 ELSE 0 END
              AS VARCHAR) FROM c),
        s AS (SELECT cluster, 'name' AS attr, name AS value FROM m
          UNION ALL SELECT cluster, 'seg', seg FROM m
          UNION ALL SELECT cluster, 'cents', cents FROM m),
        g AS (SELECT cluster, attr, value, CAST(count(*) AS BIGINT) AS c
          FROM s WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        st AS (SELECT cluster, attr, max(c) AS maxc,
            CAST(count(*) AS BIGINT) AS n_values FROM g GROUP BY 1, 2),
        gd AS (SELECT g.cluster, g.attr, st.maxc, st.n_values,
            min(g.value) AS golden_value
          FROM g JOIN st ON g.cluster = st.cluster AND g.attr = st.attr
            AND g.c = st.maxc
          GROUP BY 1, 2, 3, 4),
        mem AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
          FROM m GROUP BY 1),
        cells AS (SELECT cluster, n_members, attr FROM mem
          CROSS JOIN (SELECT unnest(['cents', 'name', 'seg']) AS attr))
        SELECT cells.cluster, cells.n_members, cells.attr,
          gd.golden_value, coalesce(gd.maxc, 0) AS support,
          coalesce(gd.n_values, 0) AS n_values
        FROM cells LEFT JOIN gd ON cells.cluster = gd.cluster
          AND cells.attr = gd.attr
        ORDER BY cells.cluster, cells.attr""")),

    // ---- per-brand 2-D skyline: the Pareto frontier of (price, size)
    //      — one sorted window pass, no dominance self-join ------------
    Q("x148_pareto_frontier",
      (s, dir) => graft.operators.Skyline.frontier2d(
        t(s, dir, "part").select(col("p_brand"), col("p_partkey"),
          round(col("p_retailprice") * 100).cast("long").as("cents"),
          col("p_size")),
        "p_brand", "p_partkey", "cents", "p_size")
        .orderBy(col("p_brand"), col("cost"), col("p_partkey")),
      Some("""WITH b AS (SELECT p_brand, p_partkey,
            CAST(round(p_retailprice * 100) AS BIGINT) AS cost,
            CAST(p_size AS BIGINT) AS benefit FROM part),
        w AS (SELECT *,
            max(benefit) OVER (PARTITION BY p_brand ORDER BY cost
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS best_cheaper,
            max(benefit) OVER (PARTITION BY p_brand, cost) AS best_tie
          FROM b)
        SELECT p_brand, p_partkey, cost, benefit FROM w
        WHERE (best_cheaper IS NULL OR best_cheaper < benefit)
          AND best_tie = benefit
        ORDER BY p_brand, cost, p_partkey""")),

    // ---- per-type daily volume trend: exact-integer OLS slope (the
    //      x123 contract) — "is this source ramping or dying?", the
    //      growth complement of the x78/x84 content-drift detectors ---
    Q("x149_volume_trend",
      (s, dir) => graft.operators.Trend.dailyVolumeSlope(
        t(s, dir, "events"), "ts", "event_type")
        .orderBy(col("grp")),
      Some("""WITH daily AS (SELECT event_type AS grp,
            CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
            CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(d) AS BIGINT) AS sd,
            CAST(sum(c) AS BIGINT) AS total_events
          FROM daily GROUP BY 1),
        m2 AS (SELECT *, sd // n_days AS mx,
            total_events // n_days AS my FROM m),
        f AS (SELECT daily.grp, m2.n_days, m2.total_events, m2.my,
            CAST(sum((d - mx) * (c - my)) AS BIGINT) AS sxy,
            CAST(sum((d - mx) * (d - mx)) AS BIGINT) AS sxx
          FROM daily JOIN m2 USING (grp)
          GROUP BY 1, 2, 3, 4)
        SELECT grp, n_days, total_events, my AS mean_per_day,
          CASE WHEN sxx > 0 THEN sxy * 1000000 // sxx END AS slope_micro,
          CASE WHEN sxx > 0 AND my > 0
            THEN (sxy * 1000000 // sxx) // my END AS rel_slope_micro
        FROM f ORDER BY grp""")),

    // ---- floor-clamped inventory ledger per part: the "impossible in
    //      SQL" recurrence b_t = max(0, b_{t-1} + delta) via the
    //      prefix-min identity b_t = P_t - min(0, min P) — returns
    //      restock (+qty), shipments draw (-qty) ----------------------
    Q("x150_clamped_balance",
      (s, dir) => graft.operators.Ledger.clampedBalanceSummary(
        t(s, dir, "lineitem").select(col("l_partkey"),
          when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(-col("l_quantity")).cast("long").as("delta"),
          col("l_shipdate"), col("l_orderkey"), col("l_linenumber")),
        "l_partkey", "delta",
        Seq("l_shipdate", "l_orderkey", "l_linenumber"))
        .orderBy(col("l_partkey")),
      Some("""WITH mv AS (SELECT l_partkey AS acct,
            CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
                 ELSE -l_quantity END AS BIGINT) AS delta,
            l_shipdate, l_orderkey, l_linenumber FROM lineitem),
        w1 AS (SELECT *, CAST(sum(delta) OVER ord AS BIGINT) AS p
          FROM mv WINDOW ord AS (PARTITION BY acct
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS UNBOUNDED PRECEDING)),
        w2 AS (SELECT *,
            least(0, CAST(min(p) OVER ord AS BIGINT)) AS flr
          FROM w1 WINDOW ord AS (PARTITION BY acct
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS UNBOUNDED PRECEDING)),
        w3 AS (SELECT *, p - flr AS bal,
            least(0, coalesce(lag(flr) OVER (PARTITION BY acct
              ORDER BY l_shipdate, l_orderkey, l_linenumber), 0))
              AS prev_flr
          FROM w2),
        w4 AS (SELECT *, greatest(0, prev_flr - p) AS short FROM w3)
        SELECT acct AS l_partkey, CAST(count(*) AS BIGINT) AS n_moves,
          CAST(sum(delta) - least(0, min(p)) AS BIGINT)
            AS final_balance,
          CAST(max(bal) AS BIGINT) AS peak_balance,
          CAST(sum(CASE WHEN short > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_clamps,
          CAST(sum(short) AS BIGINT) AS unmet_draw
        FROM w4 GROUP BY 1 ORDER BY l_partkey""")),

    // ---- A/B experiment readout: per-event-type user-conversion
    //      rates between the user_id-parity arms, pooled two-proportion
    //      z-test multiplied through into pure integers --------------
    Q("x151_ab_test",
      (s, dir) => graft.operators.AbTest.conversionReport(
        t(s, dir, "events")
          .select(col("user_id"), (col("user_id") % 2 === 1).as("treat"),
            col("event_type")),
        "user_id", "treat", "event_type")
        .orderBy(col("metric")),
      Some("""WITH u AS (SELECT DISTINCT user_id AS u,
            user_id % 2 = 1 AS t FROM events),
        sz AS (SELECT
            CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM u),
        c AS (SELECT DISTINCT event_type AS metric, user_id AS u,
            user_id % 2 = 1 AS t FROM events),
        agg AS (SELECT metric,
            CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT)
              AS x1,
            CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS x2
          FROM c GROUP BY 1)
        SELECT metric, n1 AS n_control, x1 AS x_control, n2 AS n_treat,
          x2 AS x_treat,
          x1 * 1000000 // n1 AS share_control_micro,
          x2 * 1000000 // n2 AS share_treat_micro,
          x2 * 1000000 // n2 - x1 * 1000000 // n1 AS diff_micro,
          (x1 * n2 - x2 * n1) * (x1 * n2 - x2 * n1) * (n1 + n2) >
            4 * (x1 + x2) * ((n1 + n2) - x1 - x2) * n1 * n2
            AS significant
        FROM agg CROSS JOIN sz ORDER BY metric""")),

    // ---- candidate-key audit over lineitem: which column sets are
    //      actually unique + non-null (merge-key / dedup-key safety),
    //      with the max-dup and null-count evidence --------------------
    Q("x152_key_candidates",
      (s, dir) => graft.operators.KeyCandidates.audit(
        t(s, dir, "lineitem"), Seq(
          Seq("l_orderkey"),
          Seq("l_orderkey", "l_linenumber"),
          Seq("l_partkey", "l_suppkey"),
          Seq("l_orderkey", "l_partkey", "l_suppkey")))
        .orderBy(col("candidate")),
      Some("""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows
          FROM lineitem),
        c1 AS (SELECT 'l_orderkey' AS candidate,
            CAST(count(*) AS BIGINT) AS n_distinct,
            CAST(sum(c) AS BIGINT) AS n_nonnull,
            CAST(max(c) AS BIGINT) AS max_dup
          FROM (SELECT count(*) AS c FROM lineitem
                WHERE l_orderkey IS NOT NULL GROUP BY l_orderkey)),
        c2 AS (SELECT 'l_orderkey+l_linenumber',
            CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
            CAST(max(c) AS BIGINT)
          FROM (SELECT count(*) AS c FROM lineitem
                WHERE l_orderkey IS NOT NULL
                  AND l_linenumber IS NOT NULL
                GROUP BY l_orderkey, l_linenumber)),
        c3 AS (SELECT 'l_partkey+l_suppkey',
            CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
            CAST(max(c) AS BIGINT)
          FROM (SELECT count(*) AS c FROM lineitem
                WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
                GROUP BY l_partkey, l_suppkey)),
        c4 AS (SELECT 'l_orderkey+l_partkey+l_suppkey',
            CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
            CAST(max(c) AS BIGINT)
          FROM (SELECT count(*) AS c FROM lineitem
                WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
                  AND l_suppkey IS NOT NULL
                GROUP BY l_orderkey, l_partkey, l_suppkey)),
        u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
              UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4)
        SELECT candidate, n.n_rows, u.n_nonnull, u.n_distinct,
          u.max_dup,
          (u.n_nonnull = n.n_rows AND u.max_dup = 1) AS is_key
        FROM u CROSS JOIN n ORDER BY candidate""")),

    // ---- streaming vocabulary-novelty ledger: x129's Heaps growth
    //      curve fed incrementally — per-batch distinct shingle md5s,
    //      first-seen = min asserting batch (replay-stable); "how much
    //      of this batch is new text" without re-shingling history ----
    Q("x175_streaming_novelty_ledger",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("novlg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/novlg")
        s.sql("CREATE DATABASE IF NOT EXISTS novlg")
        s.sql("DROP TABLE IF EXISTS novlg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("novlg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingNoveltyLedger(s,
          landing.toString, docs.schema, "novlg.ledger", ckpt.toString,
          "text", n = 4)
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        EventStreams.noveltyReport(s.table("novlg.ledger"))
          .orderBy(col("batch_id"))
      },
      Some(s"""WITH tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id % 2 AS b, unnest(s) AS t FROM tk),
        f AS (SELECT md5(t) AS sh, CAST(min(b) AS BIGINT) AS batch_id
          FROM ex0 GROUP BY md5(t)),
        p AS (SELECT batch_id, CAST(count(*) AS BIGINT) AS n_new_shingles
          FROM f GROUP BY 1),
        v AS (SELECT CAST(sum(n_new_shingles) AS BIGINT) AS vocab FROM p)
        SELECT batch_id, n_new_shingles,
          n_new_shingles * 1000000 // vocab AS share_of_vocab_micro
        FROM p CROSS JOIN v ORDER BY batch_id""")),

    // ---- Benford first-digit audit (Newcomb/Benford; Nigrini's
    //      forensic test): natural amounts track log10(1+1/d), uniform
    //      ids and capped quantities deviate hard — one stacked pass +
    //      one (column, digit) count agg, all-integer shares ----------
    Q("x174_benford_audit",
      (s, dir) => graft.operators.Benford.firstDigitReport(
        t(s, dir, "lineitem"), Seq(
          "price_cents" ->
            round(col("l_extendedprice") * 100).cast("long"),
          "quantity" -> round(col("l_quantity")).cast("long"),
          "partkey" -> col("l_partkey")))
        .orderBy(col("column_name"), col("digit")),
      Some("""WITH s AS (
          SELECT 'price_cents' AS column_name,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS v
          FROM lineitem
          UNION ALL SELECT 'quantity', CAST(round(l_quantity) AS BIGINT)
          FROM lineitem
          UNION ALL SELECT 'partkey', l_partkey FROM lineitem),
        c AS (SELECT column_name,
            CAST(substr(CAST(abs(v) AS VARCHAR), 1, 1) AS INT) AS digit,
            CAST(count(*) AS BIGINT) AS n
          FROM s WHERE v IS NOT NULL AND v <> 0 GROUP BY 1, 2),
        t AS (SELECT column_name, CAST(sum(n) AS BIGINT) AS nt
          FROM c GROUP BY 1)
        SELECT c.column_name, c.digit, c.n,
          c.n * 1000000 // t.nt AS share_micro,
          CAST(CASE c.digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
            WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
            WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
            ELSE 45757 END AS BIGINT) AS benford_micro,
          abs(c.n * 1000000 // t.nt
            - CASE c.digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
              WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
              WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
              ELSE 45757 END) AS dev_micro
        FROM c JOIN t USING (column_name)
        ORDER BY column_name, digit""")),

    // ---- l-diversity audit (Machanavajjhala ICDE'06): the homogeneity
    //      attack x112's k-anonymity can't see — per (source, size
    //      bucket) class, distinct-lang count + the top value's share;
    //      everything re-aggregates ONE (class, sensitive) count table -
    Q("x173_l_diversity",
      (s, dir) => graft.operators.KAnonymity.lDiversityReport(
        t(s, dir, "documents"), Seq(
          "source" -> col("source"),
          "size_bucket" -> expr("n_chars DIV 256")),
        "lang" -> col("lang"), l = 3L)
        .orderBy(col("source"), col("size_bucket")),
      Some("""WITH vc AS (SELECT source, n_chars // 256 AS size_bucket,
            lang, CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2, 3),
        cls AS (SELECT source, size_bucket,
            CAST(sum(c) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS n_sensitive_values,
            CAST(max(c) AS BIGINT) AS top
          FROM vc GROUP BY 1, 2)
        SELECT source, size_bucket, n, n_sensitive_values,
          n_sensitive_values >= 3 AS l_diverse,
          top * 1000000 // n AS top_share_micro
        FROM cls ORDER BY source, size_bucket""")),

    // ---- streaming retention ledger: x135's cohort triangle fed
    //      incrementally — per-batch distinct (u, week) activity rows;
    //      the activity SET is the complete state (cohort = min week),
    //      so the merged triangle must equal the batch op's exactly:
    //      the oracle is x135's SQL verbatim --------------------------
    Q("x172_streaming_retention_ledger",
      (s, dir) => {
        import graft.engine._
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("retlg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/retlg")
        s.sql("CREATE DATABASE IF NOT EXISTS retlg")
        s.sql("DROP TABLE IF EXISTS retlg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("retlg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingRetentionLedger(s,
          landing.toString, ev.schema, "retlg.ledger", ckpt.toString,
          "user_id", "ts")
        ev.filter(col("event_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        ev.filter(col("event_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        graft.operators.Retention.cohortsFromActivity(
            EventStreams.mergeActivityLedger(s.table("retlg.ledger")))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH f AS (SELECT user_id AS u,
               CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
               FROM events GROUP BY user_id),
        a AS (SELECT DISTINCT user_id AS u,
               CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        sz AS (SELECT cohort_week, count(*) AS cohort_size
               FROM f GROUP BY cohort_week),
        m AS (SELECT f.cohort_week,
               CAST(datediff('day', f.cohort_week, a.week) // 7 AS INT)
                 AS week_offset,
               count(*) AS n_active
               FROM a JOIN f ON a.u = f.u
               GROUP BY f.cohort_week, 2)
        SELECT CAST(m.cohort_week AS VARCHAR) AS cohort_week,
          m.week_offset, CAST(m.n_active AS BIGINT) AS n_active,
          CAST(m.n_active * 1000000 // sz.cohort_size AS BIGINT)
            AS retention_micro
        FROM m JOIN sz ON m.cohort_week = sz.cohort_week
        ORDER BY cohort_week, week_offset""")),

    // ---- join-explosion pre-flight: exact |A JOIN B| per key BEFORE
    //      running it (Σ ca·cb over the two key-count tables, never the
    //      corpora) — demonstrated on the self-join every pair-generator
    //      must avoid; the __total__ row is the exact pair count -------
    Q("x171_join_explosion_audit",
      (s, dir) => graft.operators.Skew.joinCardinality(
        t(s, dir, "orders"), "o_custkey",
        t(s, dir, "orders"), "o_custkey", topK = 20)
        .orderBy(desc("out_rows"), col("key")),
      Some("""WITH lc AS (SELECT CAST(o_custkey AS VARCHAR) AS key,
            CAST(count(*) AS BIGINT) AS left_rows
          FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        rc AS (SELECT CAST(o_custkey AS VARCHAR) AS key,
            CAST(count(*) AS BIGINT) AS right_rows
          FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
        m AS (SELECT lc.key, lc.left_rows, rc.right_rows,
            lc.left_rows * rc.right_rows AS out_rows
          FROM lc JOIN rc USING (key)),
        top AS (SELECT * FROM m ORDER BY out_rows DESC, key LIMIT 20),
        tot AS (SELECT '__total__' AS key,
            CAST(coalesce(sum(left_rows), 0) AS BIGINT) AS left_rows,
            CAST(coalesce(sum(right_rows), 0) AS BIGINT) AS right_rows,
            CAST(coalesce(sum(out_rows), 0) AS BIGINT) AS out_rows
          FROM m)
        SELECT * FROM top UNION ALL SELECT * FROM tot
        ORDER BY out_rows DESC, key""")),

    // ---- exact weighted quantiles: "what length cutoff keeps 50/90/99%
    //      of each source's TOKENS" — x144's count-table decomposition
    //      with SUM(weight) in place of COUNT; windows only over the
    //      (group, value) histogram, the reach test cross-multiplied so
    //      it is division-free and engine-exact ------------------------
    Q("x170_weighted_quantiles",
      (s, dir) => graft.operators.WeightedQuantiles.perGroup(
        t(s, dir, "documents").select(col("source"), col("n_chars"),
          nTokens(tokens(col("text"))).cast("long").as("tok")),
        "source", "n_chars", "tok", Seq(500000L, 900000L, 990000L))
        .orderBy(col("source"), col("pct_micro")),
      Some("""WITH d AS (SELECT source, n_chars,
            CAST(len(string_split(text,' ')) AS BIGINT) AS tok
          FROM documents),
        h AS (SELECT source, n_chars AS v, CAST(sum(tok) AS BIGINT) AS cw
          FROM d GROUP BY 1, 2),
        c AS (SELECT source, v, cw,
            CAST(sum(cw) OVER (PARTITION BY source ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM h),
        t AS (SELECT source, CAST(sum(cw) AS BIGINT) AS tot
          FROM h GROUP BY 1),
        e AS (SELECT c.source, c.v, t.tot, CAST(q.p AS BIGINT) AS pct_micro
          FROM c JOIN t ON c.source = t.source
          CROSS JOIN unnest([500000, 900000, 990000]) AS q(p)
          WHERE c.cum * 1000000 >= CAST(q.p AS BIGINT) * t.tot)
        SELECT source, pct_micro, CAST(min(v) AS BIGINT) AS value_at,
          tot AS total_weight
        FROM e GROUP BY source, pct_micro, tot
        ORDER BY source, pct_micro""")),

    // ---- session transcript assembly: the chat-log-to-training-
    //      example step — x10's gap sessions rendered as ordered,
    //      budget-truncated transcript strings with a loud hot-session
    //      guard before any collect ------------------------------------
    Q("x169_session_transcripts",
      (s, dir) => graft.operators.SessionAssembly.transcripts(
        t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
        gapMinutes = 30, maxEvents = 2)
        .orderBy(col("user_id"), col("session_idx")),
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
               THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS session_idx FROM x)
        SELECT user_id, session_idx,
          CAST(count(*) AS BIGINT) AS n_events,
          count(*) > 2 AS truncated,
          strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
          array_to_string((list(event_type ORDER BY ts, event_id))[1:2],
            ';') AS transcript
        FROM s GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx""")),

    // ---- streaming token-accounting ledger: per-source doc/token
    //      totals maintained incrementally (groups-sized partials per
    //      microbatch, batch_id replay collapse) — the mix-design
    //      inputs (x98/x48/x106) kept current without corpus re-scans;
    //      merged totals must equal the plain batch aggregation -------
    // ---- streaming quantile ledger: x170 fed incrementally — each
    //      batch appends its weighted (source, n_chars) histogram
    //      partial (value-NDV-bounded, additive), the merge re-runs
    //      the x170 selection over the telescoped histogram; oracle IS
    //      x170's SQL verbatim, proving incremental == batch ----------
    Q("x206_streaming_quantile_ledger",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("text"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("qtlg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/qtlg")
        s.sql("CREATE DATABASE IF NOT EXISTS qtlg")
        s.sql("DROP TABLE IF EXISTS qtlg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("qtlg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingQuantileLedger(s,
          landing.toString, docs.schema, "qtlg.ledger", ckpt.toString,
          "source", "n_chars", nTokens(tokens(col("text"))).cast("long"))
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        EventStreams.mergeQuantileLedger(s.table("qtlg.ledger"),
            "source", "n_chars", Seq(500000L, 900000L, 990000L))
          .orderBy(col("source"), col("pct_micro"))
      },
      Some("""WITH d AS (SELECT source, n_chars,
            CAST(len(string_split(text,' ')) AS BIGINT) AS tok
          FROM documents),
        h AS (SELECT source, n_chars AS v, CAST(sum(tok) AS BIGINT) AS cw
          FROM d GROUP BY 1, 2),
        c AS (SELECT source, v, cw,
            CAST(sum(cw) OVER (PARTITION BY source ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM h),
        t AS (SELECT source, CAST(sum(cw) AS BIGINT) AS tot
          FROM h GROUP BY 1),
        e AS (SELECT c.source, c.v, t.tot, CAST(q.p AS BIGINT) AS pct_micro
          FROM c JOIN t ON c.source = t.source
          CROSS JOIN unnest([500000, 900000, 990000]) AS q(p)
          WHERE c.cum * 1000000 >= CAST(q.p AS BIGINT) * t.tot)
        SELECT source, pct_micro, CAST(min(v) AS BIGINT) AS value_at,
          tot AS total_weight
        FROM e GROUP BY source, pct_micro, tot
        ORDER BY source, pct_micro""")),

    // ---- rank-biased overlap (Webber TOIS 2010): how much of the
    //      diversity scorer's top-weighted ordering survives
    //      QUANTIZING the score to 10^4-wide buckets? — the no-labels
    //      ranking-agreement leg of the eval family (x126 scores vs
    //      labeled truth, x202 vs an outcome), asked here as the "can
    //      we ship the bucketed scorer" calibration question; ranks
    //      from GlobalOrder (no global window), everything after the
    //      depth truncation is a 50-row frame; geometric weights are
    //      driver literals on BOTH engines (no pow() parity risk) -----
    Q("x207_rbo_ranking_agreement",
      (s, dir) => {
        val base = t(s, dir, "documents")
          .withColumn("ts", tokens(col("text")))
          .withColumn("ka", lpad((lit(1000000L) -
            expr("size(array_distinct(ts)) * 1000000L DIV size(ts)"))
            .cast("string"), 7, "0"))
          .withColumn("kb", lpad((lit(1000000L) -
            expr("size(array_distinct(ts)) * 1000000L DIV size(ts) " +
              "DIV 10000 * 10000")).cast("string"), 7, "0"))
          // persisted: both positioning chains scan the tokenized base
          // several times each (the x203/x62 shared-legs lesson)
          .select(col("doc_id"), col("ka"), col("kb")).persist()
        graft.operators.Rbo.truncated(base, "doc_id", "ka", "kb",
            pMicro = 900000L, depth = 50)
          .orderBy(col("d"))
      },
      Some {
        val p = 0.9
        val w = (1 to 50).map(d => s"($d, ${BigDecimal((1 - p) *
          math.pow(p, d - 1) / d)
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)})")
          .mkString(", ")
        s"""WITH base AS (SELECT doc_id,
            lpad(CAST(1000000 - len(list_distinct(string_split(text,' ')))
                * 1000000 // len(string_split(text,' ')) AS VARCHAR),
              7, '0') AS ka,
            lpad(CAST(1000000 - len(list_distinct(string_split(text,' ')))
                * 1000000 // len(string_split(text,' '))
                // 10000 * 10000 AS VARCHAR), 7, '0') AS kb
          FROM documents),
        ra AS (SELECT doc_id,
            row_number() OVER (ORDER BY ka, doc_id) AS r FROM base),
        rb AS (SELECT doc_id,
            row_number() OVER (ORDER BY kb, doc_id) AS r FROM base),
        m AS (SELECT greatest(ra.r, rb.r) AS m
          FROM ra JOIN rb USING (doc_id)
          WHERE greatest(ra.r, rb.r) <= 50),
        h AS (SELECT m, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY 1),
        w(d, wgt) AS (VALUES $w),
        xd AS (SELECT CAST(w.d AS BIGINT) AS d, w.wgt,
            CAST(coalesce(sum(h.c), 0) AS BIGINT) AS x_d
          FROM w LEFT JOIN h ON h.m <= w.d GROUP BY 1, 2),
        terms AS (SELECT d, x_d,
            CAST(wgt * x_d AS DECIMAL(28,10)) AS t FROM xd),
        summ AS (SELECT CAST(-1 AS BIGINT) AS d,
            max(CASE WHEN d = 50 THEN x_d END) AS x_d,
            CAST(floor(sum(t) * 1000000) AS BIGINT) AS term_micro
          FROM terms)
        SELECT d, x_d, CAST(floor(t * 1000000) AS BIGINT) AS term_micro
        FROM terms
        UNION ALL SELECT * FROM summ
        ORDER BY d"""
      }),

    Q("x168_streaming_token_ledger",
      (s, dir) => {
        import graft.engine._
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        val wh = java.nio.file.Paths.get(new java.net.URI(
          s.conf.get("spark.sql.warehouse.dir")).getPath)
        val landing = wh.resolve("toklg_landing")
        val ckpt = wh.resolve("_graft_checkpoints/toklg")
        s.sql("CREATE DATABASE IF NOT EXISTS toklg")
        s.sql("DROP TABLE IF EXISTS toklg.ledger")
        for (p <- Seq(landing, ckpt, wh.resolve("toklg.db/ledger")))
          Materializer.deleteRecursively(p)
        def run(): Unit = EventStreams.streamingTokenLedger(s,
          landing.toString, docs.schema, "toklg.ledger", ckpt.toString,
          "source", nTokens(tokens(col("text"))))
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(landing.toString)
        run()
        docs.filter(col("doc_id") % 2 === 1)
          .write.mode("append").parquet(landing.toString)
        run()
        val merged = EventStreams.mergeTokenLedger(
          s.table("toklg.ledger"), "source")
        val tot = merged.agg(sum(col("tokens")).as("tt"))
        merged.crossJoin(broadcast(tot))
          .select(col("source"), col("docs"), col("tokens"),
            expr("tokens * 1000000 DIV tt").as("share_micro"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT source, CAST(count(*) AS BIGINT) AS docs,
            CAST(sum(len(string_split(text,' '))) AS BIGINT) AS tokens
          FROM documents GROUP BY source),
        t AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt FROM d)
        SELECT source, docs, tokens, tokens * 1000000 // tt AS share_micro
        FROM d CROSS JOIN t ORDER BY source""")),

    // ---- quality-aware survivorship: per near-dup cluster (the x19
    //      components), keep the HIGHEST-n_chars member (tie → min id)
    //      instead of min id — "keep the best copy, not the first";
    //      two-stage argmax, no per-cluster window --------------------
    Q("x167_best_in_cluster",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
          n = 4, threshold = 0.2, maxDf = 100L)
        val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b",
          maxRounds = 60)
        val labeled = docs.select(col("doc_id"), col("n_chars"))
          .join(comp, docs("doc_id") === comp("v"), "left")
          .select(coalesce(col("comp"), col("doc_id")).as("component"),
            col("doc_id"), col("n_chars"))
        Dedup.bestInGroup(labeled, "component", "doc_id", "n_chars")
          .orderBy(col("component"))
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $shingleSql AS s FROM documents),
        ex0 AS (SELECT doc_id AS doc, unnest(s) AS sh FROM tk),
        keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 100),
        ex AS (SELECT doc, ex0.sh FROM ex0 JOIN keep ON ex0.sh = keep.sh),
        sz AS (SELECT doc, count(*) AS n_sh FROM ex GROUP BY doc),
        co AS (SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS common
               FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc < b.doc
               GROUP BY a.doc, b.doc),
        pr AS (SELECT doc_a, doc_b
               FROM co JOIN sz sa ON doc_a = sa.doc JOIN sz sb ON doc_b = sb.doc
               WHERE CAST(common AS DOUBLE)/(sa.n_sh + sb.n_sh - common) >= 0.2),
        edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
                  UNION SELECT doc_b, doc_a FROM pr),
        reach AS (SELECT s AS v, s AS l FROM edges
                  UNION
                  SELECT e.s, r.l FROM reach r JOIN edges e ON e.d = r.v),
        comp AS (SELECT v, min(l) AS component FROM reach GROUP BY v),
        lab AS (SELECT coalesce(c.component, d.doc_id) AS component,
            d.doc_id, d.n_chars
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
        mx AS (SELECT component, max(n_chars) AS kept_score,
            CAST(count(*) AS BIGINT) AS n_members
          FROM lab GROUP BY component)
        SELECT m.component, CAST(min(l.doc_id) AS BIGINT) AS keep_id,
          m.kept_score, m.n_members
        FROM mx m JOIN lab l
          ON l.component = m.component AND l.n_chars = m.kept_score
        GROUP BY m.component, m.kept_score, m.n_members
        ORDER BY m.component""")),

    // ---- hierarchy flattening by pointer jumping: every node of a
    //      parent-pointer forest (deterministic block-of-64 trees
    //      derived from doc ids) gets its root + depth in O(log depth)
    //      self-join rounds — the oracle is the O(depth) recursive CTE
    //      the operator exists to beat ---------------------------------
    Q("x165_hierarchy_flatten",
      (s, dir) => {
        val nodes = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 64 === 0, lit(null).cast("long"))
            .otherwise((col("doc_id") - col("doc_id") % 64) +
              (col("doc_id") * 37 + 11) % (col("doc_id") % 64))
            .as("parent"))
        graft.operators.Hierarchy.flattenToRoots(
            nodes, "doc_id", "parent", maxDepth = 64L)
          .select(col("id").as("doc_id"), col("root_id"), col("depth"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE nodes AS (SELECT doc_id,
            CASE WHEN doc_id % 64 = 0 THEN NULL
              ELSE (doc_id - doc_id % 64)
                + (doc_id * 37 + 11) % (doc_id % 64)
            END AS parent FROM documents),
        walk AS (
          SELECT doc_id, doc_id AS cur, CAST(0 AS BIGINT) AS depth
          FROM nodes
          UNION ALL
          SELECT w.doc_id, n.parent, w.depth + 1
          FROM walk w JOIN nodes n ON w.cur = n.doc_id
          WHERE n.parent IS NOT NULL)
        SELECT w.doc_id, w.cur AS root_id, w.depth
        FROM walk w JOIN nodes n ON n.doc_id = w.cur
        WHERE n.parent IS NULL
        ORDER BY w.doc_id""")),

    // ---- relation reconciliation (dbt audit_helper compare_relations
    //      analogue): row-level diff of a snapshot against its
    //      deterministically perturbed twin — one co-partitioned
    //      full-outer join, per-column null-safe comparisons, output
    //      bounded by the disagreement ---------------------------------
    Q("x164_relation_diff",
      (s, dir) => {
        val base = t(s, dir, "customer").select(
          col("c_custkey").as("k"), col("c_name").as("name"),
          col("c_nationkey").cast("long").as("nation"),
          round(col("c_acctbal") * 100).cast("long").as("cents"),
          col("c_mktsegment").as("seg"))
        val changed = base.filter(col("k") % 97 =!= 0).select(col("k"),
          when(col("k") % 11 === 0, concat(col("name"), lit("_v2")))
            .otherwise(col("name")).as("name"),
          col("nation"),
          when(col("k") % 7 === 0, col("cents") + 1)
            .otherwise(col("cents")).as("cents"),
          when(col("k") % 5 === 0, lower(col("seg")))
            .otherwise(col("seg")).as("seg"))
        val added = base.filter(col("k") % 89 === 0)
          .withColumn("k", col("k") + 1000000L)
        graft.operators.RelationDiff.diff(
            base, changed.unionByName(added), Seq("k"))
          .orderBy(col("k"))
      },
      Some("""WITH base AS (SELECT c_custkey AS k, c_name AS name,
            CAST(c_nationkey AS BIGINT) AS nation,
            CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
            c_mktsegment AS seg FROM customer),
        changed AS (SELECT k,
            CASE WHEN k % 11 = 0 THEN name || '_v2' ELSE name END AS name,
            nation,
            CASE WHEN k % 7 = 0 THEN cents + 1 ELSE cents END AS cents,
            CASE WHEN k % 5 = 0 THEN lower(seg) ELSE seg END AS seg
          FROM base WHERE k % 97 <> 0),
        added AS (SELECT k + 1000000 AS k, name, nation, cents, seg
          FROM base WHERE k % 89 = 0),
        rhs AS (SELECT * FROM changed UNION ALL SELECT * FROM added),
        j AS (SELECT coalesce(l.k, r.k) AS k,
            l.k IS NOT NULL AS in_l, r.k IS NOT NULL AS in_r,
            l.name AS ln, r.name AS rn, l.nation AS lnat,
            r.nation AS rnat, l.cents AS lc, r.cents AS rc,
            l.seg AS ls, r.seg AS rs
          FROM base l FULL OUTER JOIN rhs r ON l.k = r.k),
        d AS (SELECT k, in_l, in_r, ln, rn, lnat, rnat, lc, rc, ls, rs,
            CASE WHEN NOT in_r THEN 'removed'
              WHEN NOT in_l THEN 'added'
              WHEN (ln IS DISTINCT FROM rn)
                OR (lnat IS DISTINCT FROM rnat)
                OR (lc IS DISTINCT FROM rc)
                OR (ls IS DISTINCT FROM rs) THEN 'changed'
              ELSE 'identical' END AS status
          FROM j)
        SELECT k, status,
          CASE WHEN status = 'changed' THEN concat_ws(',',
            CASE WHEN ln IS DISTINCT FROM rn THEN 'name' END,
            CASE WHEN lnat IS DISTINCT FROM rnat THEN 'nation' END,
            CASE WHEN lc IS DISTINCT FROM rc THEN 'cents' END,
            CASE WHEN ls IS DISTINCT FROM rs THEN 'seg' END)
          ELSE '' END AS changed_cols
        FROM d WHERE status <> 'identical' ORDER BY k""")),

    // ---- context-length fit report: tokenize ONCE (the x08 counter),
    //      then one map-side-combined agg answers "what does 16 vs 32
    //      vs 64 tokens of context cost" — truncation loss, docs over,
    //      and the split-to-fit sequence count; fan-out = |contexts| ---
    Q("x166_context_fit",
      (s, dir) => graft.operators.ContextFit.report(
        t(s, dir, "documents").select(col("source"),
          nTokens(tokens(col("text"))).cast("long").as("tok")),
        "source", "tok", Seq(16L, 32L, 64L))
        .orderBy(col("source"), col("ctx")),
      Some("""WITH d AS (SELECT source,
          CAST(len(string_split(text,' ')) AS BIGINT) AS tok
          FROM documents),
        e AS (SELECT source, tok, CAST(c AS BIGINT) AS ctx
          FROM d CROSS JOIN unnest([16, 32, 64]) AS t(c)),
        a AS (SELECT source, ctx,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN tok > ctx THEN 1 ELSE 0 END) AS BIGINT)
              AS n_docs_over,
            CAST(sum(tok) AS BIGINT) AS tokens_total,
            CAST(sum(greatest(tok - ctx, 0)) AS BIGINT)
              AS tokens_truncated,
            CAST(sum((tok + ctx - 1) // ctx) AS BIGINT) AS n_chunks
          FROM e GROUP BY 1, 2)
        SELECT source, ctx, n_docs, n_docs_over, tokens_total,
          tokens_truncated,
          CAST(CASE WHEN tokens_total = 0 THEN 1000000
            ELSE (tokens_total - tokens_truncated) * 1000000
              // tokens_total END AS BIGINT) AS retained_micro,
          n_chunks
        FROM a ORDER BY source, ctx"""))
  )

  /** Morton bit-interleave of two already-normalized dims as DuckDB SQL
    * (x178's oracle twin of ZOrder.interleave): bit k of dim i lands at
    * position k·2 + i, loop-unrolled like the Spark expression. */
  private def mortonSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(k => Seq(
      s"((($a >> $k) & 1) << ${2 * k})",
      s"((($b >> $k) & 1) << ${2 * k + 1})")).mkString(" + ")

  /** One SRP sign bit as DuckDB SQL (srpCtes' bitSql, shared shape):
    * plane `p` against the md5-seeded ±1 hyperplane over `embedding`. */
  private def srpBitSql(p: Int): String =
    s"""CASE WHEN round(list_sum(list_transform(range(len(embedding)),
       i -> CAST(embedding[i+1] AS DOUBLE) *
         (CASE WHEN substr(md5('${p}_'||CAST(i AS VARCHAR)),1,1) >= '8'
          THEN 1.0 ELSE -1.0 END))), 4) >= 0 THEN '1' ELSE '0' END"""

  /** x116's nested-subset thresholds (permille) and the hex-string
    * CASE chain their oracle replays: frac < p·16^6/1000 ⟺ the first
    * six md5 hex digits compare below the cutoff's %06x rendering
    * (fixed width + lowercase makes string order = integer order). */
  private def ablationPermilles = Seq(10, 20, 50, 100, 250, 500, 1000)
  private def ablationCaseSql = ablationPermilles.init
    .map(p => f"WHEN h6 < '${p * (1L << 24) / 1000}%06x' THEN $p")
    .mkString(" ") + s" ELSE ${ablationPermilles.last}"
}
