package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import java.util.concurrent.Executors

/** The project registry + runner: models/sources/seeds/tests are declared
  * as Scala values; `compile()` resolves every model once (memoized,
  * cycle-checked) while recording `ref`/`source` edges; `run()` builds the
  * DAG in topological order with bounded parallelism (the reference's
  * `threads: 16` contract) and interleaves data tests `dbt build`-style:
  * a failing test blocks downstream models (`README.md:280`).
  */
final class Project(val spark: SparkSession, val target: Target) {

  private val models = mutable.LinkedHashMap[String, Model]()
  private val sources = mutable.LinkedHashMap[(String, String), SourceDef]()
  private val seeds = mutable.LinkedHashMap[String, Seed]()
  private val snapshots = mutable.LinkedHashMap[String, Snapshot]()
  private val analyses = mutable.LinkedHashMap[String, Analysis]()
  private val tests = mutable.ArrayBuffer[DataTest]()

  // ---- declaration API -------------------------------------------------

  def model(name: String, config: ModelConfig = ModelConfig())(
      build: Ctx => DataFrame): this.type = {
    // snapshots share the ref namespace ('model wins' on resolution), so a
    // model shadowing an earlier snapshot must fail at declare time just
    // like the reverse order does in snapshot(); analyses share the
    // compiledSql namespace
    require(!models.contains(name) && !snapshots.contains(name) &&
      !analyses.contains(name), s"duplicate node $name")
    models(name) = Model(name, config, build)
    this
  }

  /** SQL-text model: `{{ ref('x') }}` / `{{ source('a','b') }}`
    * placeholders are resolved to temp views before `spark.sql`, mirroring
    * the reference's compile step without a template engine. The raw SQL
    * is kept on the Model so view materialization can emit a persistent
    * `CREATE VIEW` when every dependency is a physical table. */
  def sqlModel(name: String, config: ModelConfig = ModelConfig())(
      sql: String): this.type = {
    require(!models.contains(name) && !snapshots.contains(name) &&
      !analyses.contains(name), s"duplicate node $name")
    Project.lintSqlModel(spark, name, sql)
    models(name) = Model(name, config, sqlBuild(sql), sqlText = Some(sql))
    this
  }

  /** Build function for SQL text: `{{ ref }}`/`{{ source }}` placeholders
    * resolve to temp views before `spark.sql` (shared by [[sqlModel]] and
    * [[analysis]]). */
  private def sqlBuild(sql: String): Ctx => DataFrame = { ctx =>
    var out = sql
    for (m <- Project.RefPat.findAllMatchIn(sql).toList.distinctBy(_.group(1))) {
      val dep = m.group(1)
      val view = s"graft_ref_${Ident.normalize(dep)}"
      ctx.ref(dep).createOrReplaceTempView(view)
      out = Project.RefPat.replaceAllIn(out,
        m2 => if (m2.group(1) == dep) view else m2.matched)
    }
    for (m <- Project.SrcPat.findAllMatchIn(sql).toList.distinctBy(m => (m.group(1), m.group(2)))) {
      val (s0, t0) = (m.group(1), m.group(2))
      val view = s"graft_src_${Ident.normalize(s0)}_${Ident.normalize(t0)}"
      ctx.source(s0, t0).createOrReplaceTempView(view)
      out = Project.SrcPat.replaceAllIn(out,
        m2 => if (m2.group(1) == s0 && m2.group(2) == t0) view else m2.matched)
    }
    ctx.spark.sql(out)
  }

  /** Declare an analysis — the reference's `analyses/` resource slot
    * (`dbt_project.yml:15` `analysis-paths`): SQL that is linted and
    * compiled with the project (placeholders resolve, edges are recorded,
    * docs/`ls` list it) but NEVER materialized by run/build — dbt has no
    * command that executes an analysis. */
  def analysis(name: String)(sql: String): this.type = {
    require(!analyses.contains(name) && !models.contains(name) &&
      !snapshots.contains(name), s"duplicate node $name")
    Project.lintSqlModel(spark, name, sql)
    analyses(name) = Analysis(name, sqlBuild(sql), sql)
    this
  }

  private[engine] def modelOpt(name: String): Option[Model] = models.get(name)
  private[engine] def sourceOpt(s0: String, t0: String): Option[SourceDef] =
    sources.get((s0, t0))
  private[engine] def sourceDefs: Seq[SourceDef] = sources.values.toSeq
  /** Resolve a source to its schema (throws when unreadable) — the
    * `dbt debug` source check. */
  private[engine] def checkSource(sd: SourceDef): Unit = sourceDf(sd).schema
  /** Source schema if resolvable (docs generation never fails on a
    * broken source — debug reports those). */
  private[engine] def sourceSchema(sd: SourceDef): Option[org.apache.spark.sql.types.StructType] =
    try Some(sourceDf(sd).schema) catch { case _: Exception => None }

  def source(sourceName: String, table: String, location: SourceLocation): this.type = {
    sources((sourceName, table)) = SourceDef(sourceName, table, location)
    this
  }

  def seed(name: String, csvPath: String): this.type = {
    seeds(name) = Seed(name, csvPath)
    this
  }

  /** Declare an SCD-2 snapshot as a graph node (the reference's
    * `snapshot-paths` resource — `dbt_project.yml:19`). It participates
    * in `run --select`, topo ordering, and the orphan macro's claimed
    * set; downstream models `ref(name)` the accumulated SCD-2 table. */
  def snapshot(name: String, uniqueKey: String, checkCols: Seq[String],
      config: ModelConfig = ModelConfig(Materialization.Table),
      asOf: () => java.sql.Timestamp =
        () => new java.sql.Timestamp(System.currentTimeMillis()),
      partitions: Option[Int] = None)(
      build: Ctx => DataFrame): this.type = {
    require(!snapshots.contains(name) && !models.contains(name) &&
      !analyses.contains(name), s"duplicate node $name")
    snapshots(name) =
      Snapshot(name, build, uniqueKey, checkCols, config, asOf, partitions)
    this
  }

  def test(t: DataTest): this.type = { tests += t; this }

  /** Declare a dbt-style UNIT test (dbt-core 1.8 `unit_tests:`): the
    * model's build function runs against MOCKED inputs only and the
    * result is compared to `expect` as a row multiset. `given` keys are
    * the mocked dependency names — a model name (what the build's
    * `ctx.ref` resolves to, after versioning; snapshots by their name)
    * or `"source.<source>.<table>"`. Every dependency the build touches
    * must be mocked: resolving an unmocked one fails the test with the
    * mocked-key list, so a unit test can never silently read production
    * relations. `isIncremental` is false under the mock context (the
    * dbt default — unit tests exercise the full-refresh branch). */
  def unitTest(name: String, model: String, given: Map[String, DataFrame],
      expect: DataFrame): this.type = {
    require(!unitTestDefs.contains(name), s"duplicate unit test $name")
    unitTestDefs(name) = UnitTestDef(name, model, given, expect)
    this
  }

  private val unitTestDefs = mutable.LinkedHashMap[String, UnitTestDef]()

  /** Run every declared unit test (or those for one `model`). */
  def runUnitTests(model: String = "*"): Seq[UnitTestResult] =
    unitTestDefs.values.toSeq
      .filter(ut => model == "*" || ut.modelName == model)
      .map(runUnitTest)

  private def runUnitTest(ut: UnitTestDef): UnitTestResult =
    models.get(ut.modelName) match {
      case None => UnitTestResult(ut.name, ut.modelName, ok = false, 0, 0,
        s"unknown model '${ut.modelName}'")
      case Some(m) =>
        val mockCtx = new Ctx(
          spark,
          (dep0, version) => {
            val dep =
              try versionedName(dep0, version)
              catch { case _: NoSuchElementException => dep0 }
            ut.given.getOrElse(dep, ut.given.getOrElse(dep0,
              throw new NoSuchElementException(
                s"unit test '${ut.name}': ref('$dep0') -> '$dep' is not " +
                s"mocked (given: ${ut.given.keys.mkString(", ")})")))
          },
          (s0, t0) => ut.given.getOrElse(s"source.$s0.$t0",
            throw new NoSuchElementException(
              s"unit test '${ut.name}': source('$s0','$t0') is not " +
              s"mocked (given: ${ut.given.keys.mkString(", ")})")))
        try {
          val got = m.build(mockCtx)
          val gotCols = got.columns.toSeq
          val expCols = ut.expect.columns.toSeq
          if (gotCols.toSet != expCols.toSet)
            UnitTestResult(ut.name, ut.modelName, ok = false, 0, 0,
              s"column mismatch: got ${gotCols.mkString(",")} expected " +
              expCols.mkString(","))
          else {
            // row-multiset compare via collected counted rows (exceptAll
            // is unreliable on some Spark 4.1 plans — BASELINE.md note);
            // unit-test fixtures are small by construction
            def counted(df: DataFrame): Map[String, Int] =
              df.select(expCols.map(org.apache.spark.sql.functions.col): _*)
                .collect()
                .groupBy(_.toString).view.mapValues(_.length).toMap
            val g = counted(got)
            val e = counted(ut.expect)
            val missing = e.map { case (r, n) =>
              math.max(n - g.getOrElse(r, 0), 0) }.sum
            val unexpected = g.map { case (r, n) =>
              math.max(n - e.getOrElse(r, 0), 0) }.sum
            val detail =
              if (missing + unexpected == 0) ""
              else {
                val miss = e.keys.filterNot(g.contains).take(3)
                val unex = g.keys.filterNot(e.contains).take(3)
                s"missing=${miss.mkString(";")} unexpected=${unex.mkString(";")}"
              }
            UnitTestResult(ut.name, ut.modelName,
              ok = missing + unexpected == 0,
              missing.toLong, unexpected.toLong, detail)
          }
        } catch {
          case e: Exception =>
            UnitTestResult(ut.name, ut.modelName, ok = false, 0, 0,
              s"build failed: ${e.getMessage}")
        }
    }

  /** Rebind every declaration to another target (dbt `--target`,
    * `README.md:162`): same models/sources/seeds/snapshots/tests/hooks,
    * different schema/threads. The new instance resolves fresh against
    * its own schema namespace — no compile state is shared. */
  def withTarget(newTarget: Target): Project = {
    val p = new Project(spark, newTarget)
    models.foreach { case (k, v) => p.models(k) = v }
    sources.foreach { case (k, v) => p.sources(k) = v }
    seeds.foreach { case (k, v) => p.seeds(k) = v }
    snapshots.foreach { case (k, v) => p.snapshots(k) = v }
    analyses.foreach { case (k, v) => p.analyses(k) = v }
    tests.foreach(p.tests += _)
    unitTestDefs.foreach { case (k, v) => p.unitTestDefs(k) = v }
    runStartHooks.foreach(p.runStartHooks += _)
    runEndHooks.foreach(p.runEndHooks += _)
    p.failuresSchema = failuresSchema
    p
  }

  private var failuresSchema: Option[String] = None
  /** dbt `store_failures`: failing tests persist their violations table
    * to `<schema>.<test_name>` for post-mortem queries. */
  def storeFailuresIn(schema: String): this.type = {
    failuresSchema = Some(Ident.normalize(schema)); this
  }

  /** The generic-test quartet (schema.yml tests + the standard remainder
    * of the family — SURVEY.md §2.10). */
  def testUnique(model: String, column: String): this.type =
    test(DataTest(s"unique__${model}__$column", model,
      GenericTests.unique(_, column)))
  def testNotNull(model: String, column: String): this.type =
    test(DataTest(s"not_null__${model}__$column", model,
      GenericTests.notNull(_, column)))
  def testAcceptedValues(model: String, column: String, values: Seq[Any]): this.type =
    test(DataTest(s"accepted_values__${model}__$column", model,
      GenericTests.acceptedValues(_, column, values)))
  def testRelationship(model: String, column: String,
      toModel: String, toColumn: String): this.type =
    test(DataTest(s"relationships__${model}__$column", model, df =>
      GenericTests.relationships(df, column, resolve(toModel), toColumn)))
  def testUniqueCombination(model: String, columns: Seq[String]): this.type =
    test(DataTest(s"unique_combination__${model}__${columns.mkString("_")}",
      model, GenericTests.uniqueCombination(_, columns)))
  def testExpressionIsTrue(model: String, name: String, sqlExpr: String): this.type =
    test(DataTest(s"expression_is_true__${model}__$name", model,
      GenericTests.expressionIsTrue(_, sqlExpr)))
  def testEqualRowcount(model: String, otherModel: String): this.type =
    test(DataTest(s"equal_rowcount__${model}__$otherModel", model, df =>
      GenericTests.equalRowcount(df, materializedDf(otherModel))))
  def testAcceptedRange(model: String, column: String, lo: Any, hi: Any): this.type =
    test(DataTest(s"accepted_range__${model}__$column", model,
      GenericTests.acceptedRange(_, column, lo, hi)))
  def testNotConstant(model: String, column: String): this.type =
    test(DataTest(s"not_constant__${model}__$column", model,
      GenericTests.notConstant(_, column)))
  def testRecency(model: String, tsCol: String,
      notBefore: java.sql.Timestamp): this.type =
    test(DataTest(s"recency__${model}__$tsCol", model,
      GenericTests.recency(_, tsCol, notBefore)))

  // ---- naming ----------------------------------------------------------

  /** `generate_schema_name` semantics: custom schema verbatim (trimmed),
    * else target schema; never env-prefixed. */
  def schemaFor(config: ModelConfig): String =
    Ident.normalize(config.schema.map(_.trim).getOrElse(target.schema))

  /** Physical 2-part name (ref.sql strips the database — 2 parts, always). */
  def physicalName(m: Model): String =
    s"${schemaFor(m.config)}.${Ident.normalize(m.config.alias.getOrElse(m.name))}"
  def physicalName(s: Seed): String =
    s"${schemaFor(s.config)}.${Ident.normalize(s.name)}"
  def physicalName(s: Snapshot): String =
    s"${schemaFor(s.config)}.${Ident.normalize(s.config.alias.getOrElse(s.name))}"

  // ---- compile: memoized resolution + edge recording -------------------

  /** Versioned-ref name resolution (the reference's ref() override
    * accepts `version=` — `macros/overrides/ref.sql:11-18`; dbt's
    * versioned-model rule): `ref(name, v)` reads the model declared as
    * `name_vN`; an unversioned `ref(name)` where `name` itself is not
    * declared but a `name_vN` family is resolves to the LATEST version. */
  private def versionedName(name: String, version: Option[Int]): String =
    version match {
      case Some(v) =>
        val vn = s"${name}_v$v"
        if (models.contains(vn)) vn
        else throw new NoSuchElementException(
          s"unknown version $v of model '$name' (no model named '$vn')")
      case None if models.contains(name) => name
      case None =>
        val pat = (java.util.regex.Pattern.quote(name) + "_v(\\d+)").r
        models.keys.collect { case k @ pat(n) => (n.toInt, k) } match {
          case vs if vs.nonEmpty => vs.maxBy(_._1)._2
          case _ => name // unknown either way; resolve() raises with the original name
        }
    }

  private val resolved = mutable.Map[String, DataFrame]()
  private val resolving = mutable.LinkedHashSet[String]() // cycle detection
  private val edges = mutable.Map[String, mutable.Set[String]]()
  private val snapFresh = mutable.Map[String, DataFrame]()

  /** Resolve a snapshot's FRESH query (memoized; records its ref/source
    * edges like a model build). Routed through the same `resolving`
    * cycle-detection set as models: before first build, a snapshot whose
    * fresh query (transitively) refs itself would otherwise recurse
    * resolveSnapshotFresh → snapshotDf → resolveSnapshotFresh to a
    * StackOverflowError instead of an actionable cycle message. */
  private def resolveSnapshotFresh(name: String): DataFrame =
    snapFresh.getOrElse(name, {
      val key = s"snapshot.$name"
      if (!resolving.add(key))
        throw new IllegalStateException(
          s"ref cycle: ${resolving.mkString(" -> ")} -> $key")
      val df = try snapshots(name).build(ctxFor(key))
      finally resolving.remove(key)
      snapFresh(name) = df
      df
    })

  /** What a `ref` to a snapshot reads: the accumulated SCD-2 table once
    * built; before first build, the first-run-shaped plan (same schema,
    * epoch timestamp) so compile-time resolution can type-check and
    * record edges. */
  private def snapshotDf(s: Snapshot): DataFrame =
    if (spark.catalog.tableExists(physicalName(s))) spark.table(physicalName(s))
    else Materializer.snapshotFirstRun(resolveSnapshotFresh(s.name),
      s.checkCols, new java.sql.Timestamp(0L), s.uniqueKey, s.partitions)

  // synchronized: exec-time resolution records edges from the run thread
  // pool (compile-time resolution is single-threaded, but not exclusively)
  private def recordEdge(from: String, to: String): Unit = edges.synchronized {
    edges.getOrElseUpdate(from, mutable.Set()) += to
  }

  /** Resolve a model to its (lazy) DataFrame. Ephemeral models inline;
    * materialized models still resolve to the *unbuilt* plan here — the
    * runner decides what to persist. */
  def resolve(name: String): DataFrame = resolved.getOrElseUpdate(name, {
    val m = models.getOrElse(name,
      throw new NoSuchElementException(s"unknown model '$name'"))
    if (!resolving.add(name))
      throw new IllegalStateException(
        s"ref cycle: ${resolving.mkString(" -> ")} -> $name")
    try m.build(ctxFor(m.id)) finally resolving.remove(name)
  })

  private def sourceDf(s: SourceDef): DataFrame = s.location match {
    case ParquetPath(p) => spark.read.parquet(p)
    case CatalogTable(t) => spark.table(t)
    case CsvPath(p, header, schema) =>
      val r = spark.read.option("header", header.toString)
      schema.fold(r.option("inferSchema", "true"))(r.schema).csv(p)
    case JsonPath(p, schema) =>
      schema.fold(spark.read)(spark.read.schema).json(p)
    case OrcPath(p) => spark.read.orc(p)
    case BinaryPath(p, glob) =>
      glob.fold(spark.read)(g =>
        spark.read.option("pathGlobFilter", g)).format("binaryFile").load(p)
  }

  /** Streaming read of a source: file stream over its location with the
    * batch-read schema (Structured Streaming requires one upfront), or
    * `readStream.table` for catalog tables. A path pointing at one FILE
    * streams its parent directory under a glob filter — the file source
    * wants a directory. */
  private def sourceStreamDf(s: SourceDef): DataFrame = {
    def dirAndFilter(p: String): (String, Option[String]) = {
      val f = new java.io.File(p)
      if (f.isFile) (f.getParent, Some(f.getName)) else (p, None)
    }
    s.location match {
      case ParquetPath(p) =>
        val schema = spark.read.parquet(p).schema
        val (dir, glob) = dirAndFilter(p)
        val r = spark.readStream.schema(schema)
        glob.fold(r)(g => r.option("pathGlobFilter", g)).parquet(dir)
      case CsvPath(p, header, schemaDdl) =>
        val schema = schemaDdl.map(
          org.apache.spark.sql.types.StructType.fromDDL)
          .getOrElse(spark.read.option("header", header.toString)
            .option("inferSchema", "true").csv(p).schema)
        val (dir, glob) = dirAndFilter(p)
        val r = spark.readStream.schema(schema)
          .option("header", header.toString)
        glob.fold(r)(g => r.option("pathGlobFilter", g)).csv(dir)
      case JsonPath(p, schemaDdl) =>
        val schema = schemaDdl.map(
          org.apache.spark.sql.types.StructType.fromDDL)
          .getOrElse(spark.read.json(p).schema)
        val (dir, glob) = dirAndFilter(p)
        val r = spark.readStream.schema(schema)
        glob.fold(r)(g => r.option("pathGlobFilter", g)).json(dir)
      case OrcPath(p) =>
        val schema = spark.read.orc(p).schema
        val (dir, glob) = dirAndFilter(p)
        val r = spark.readStream.schema(schema)
        glob.fold(r)(g => r.option("pathGlobFilter", g)).orc(dir)
      case BinaryPath(p, glob) =>
        // binaryFile has a FIXED schema; Structured Streaming still
        // requires it upfront
        val schema = spark.read.format("binaryFile")
          .load(p).schema
        val r = spark.readStream.schema(schema)
        glob.fold(r)(g => r.option("pathGlobFilter", g))
          .format("binaryFile").load(p)
      case CatalogTable(t) => spark.readStream.table(t)
    }
  }

  private def ctxFor(nodeId: String): Ctx = new Ctx(
    spark,
    (depName0, version) => {
      val depName = versionedName(depName0, version)
      // snapshots share the ref namespace (dbt refs snapshots by name);
      // a model of the same name wins, versioned refs are models-only
      if (!models.contains(depName) && version.isEmpty &&
          snapshots.contains(depName0)) {
        recordEdge(nodeId, s"snapshot.$depName0")
        snapshotDf(snapshots(depName0))
      } else {
        recordEdge(nodeId, s"model.$depName")
        resolve(depName)
      }
    },
    (s0, t0) => {
      val sd = sources.getOrElse((s0, t0),
        throw new NoSuchElementException(s"unknown source '$s0.$t0'"))
      recordEdge(nodeId, sd.id)
      sourceDf(sd)
    },
    thisPhysical = models.get(nodeId.stripPrefix("model."))
      .map(physicalName),
    resolveSourceStream = (s0, t0) => {
      val sd = sources.getOrElse((s0, t0),
        throw new NoSuchElementException(s"unknown source '$s0.$t0'"))
      recordEdge(nodeId, sd.id)
      sourceStreamDf(sd)
    })

  /** Execution-time resolution (dbt ref semantics): a ref to a physically
    * materialized upstream (table / incremental / bucketed /
    * insert-overwrite) reads the MATERIALIZED relation — so downstream of
    * an incremental model sees the accumulated table, not the
    * is_incremental-filtered batch, and table upstreams are read, not
    * recomputed. Only view/ephemeral upstreams keep plan inlining. Not
    * memoized ACROSS calls (the physical state changes as the run
    * progresses; topo order guarantees upstreams are built first), but
    * memoized WITHIN one call so a diamond of views costs one build per
    * dep, not 2^depth. */
  private[engine] def resolveForRun(name: String): DataFrame =
    execResolve(name, mutable.Map[String, DataFrame]())

  private def execResolve(name: String,
      memo: mutable.Map[String, DataFrame]): DataFrame =
    memo.getOrElseUpdate(name, {
      val m = models.getOrElse(name,
        throw new NoSuchElementException(s"unknown model '$name'"))
      m.build(execCtxFor(m.id, memo))
    })

  private def execCtxFor(nodeId: String,
      memo: mutable.Map[String, DataFrame]): Ctx = new Ctx(
    spark,
    (depName0, version) => {
      val depName = versionedName(depName0, version)
      if (!models.contains(depName) && version.isEmpty &&
          snapshots.contains(depName0)) {
        recordEdge(nodeId, s"snapshot.$depName0")
        snapshotDf(snapshots(depName0))
      } else {
        recordEdge(nodeId, s"model.$depName")
        val dep = models.getOrElse(depName,
          throw new NoSuchElementException(s"unknown model '$depName'"))
        dep.config.materialized match {
          case Materialization.View | Materialization.Ephemeral =>
            execResolve(depName, memo)
          case _ if spark.catalog.tableExists(physicalName(dep)) =>
            spark.table(physicalName(dep))
          case _: Materialization.StreamingTable =>
            // re-running the build would hand a STREAMING DataFrame to a
            // batch consumer — Spark's 'must be executed with
            // writeStream.start()' error is opaque; fail actionably
            throw new IllegalStateException(
              s"model.$depName is a StreamingTable that has not been " +
                "built yet — run it before batch consumers read it " +
                "(topo-ordered run() does; ad-hoc resolution cannot)")
          case _ => // physical upstream not built yet (ad-hoc resolution)
            execResolve(depName, memo)
        }
      }
    },
    (s0, t0) => {
      val sd = sources.getOrElse((s0, t0),
        throw new NoSuchElementException(s"unknown source '$s0.$t0'"))
      recordEdge(nodeId, sd.id)
      sourceDf(sd)
    },
    thisPhysical = models.get(nodeId.stripPrefix("model."))
      .map(physicalName),
    resolveSourceStream = (s0, t0) => {
      val sd = sources.getOrElse((s0, t0),
        throw new NoSuchElementException(s"unknown source '$s0.$t0'"))
      recordEdge(nodeId, sd.id)
      sourceStreamDf(sd)
    })

  /** dbt `compile` analogue for SQL-text nodes: the declared SQL with
    * every placeholder replaced by the PHYSICAL relation it resolves to
    * (2-part schema.alias for refs — snapshot refs included; catalog
    * table or `parquet.`path`` for sources) — what dbt writes under
    * target/compiled. DataFrame models carry no SQL text; they compile
    * to Catalyst plans directly. */
  def compiledSql(name: String): Option[String] =
    models.get(name).flatMap(_.sqlText)
      .orElse(analyses.get(name).map(_.sqlText))
      .map(substitutePhysical(_))

  private def substitutePhysical(sql: String,
      inlining: Set[String] = Set.empty): String = {
    val withRefs = Project.RefPat.replaceAllIn(sql, m2 => {
      val dep = m2.group(1)
      java.util.regex.Matcher.quoteReplacement(compiledRelation(dep, inlining))
    })
    Project.SrcPat.replaceAllIn(withRefs, m2 => {
      val sd = sources.getOrElse((m2.group(1), m2.group(2)),
        throw new NoSuchElementException(
          s"unknown source '${m2.group(1)}.${m2.group(2)}'"))
      java.util.regex.Matcher.quoteReplacement(sd.location match {
        case CatalogTable(t) => t
        case ParquetPath(p) => s"parquet.`$p`"
        case CsvPath(p, _, _) => s"csv.`$p`"
        case JsonPath(p, _) => s"json.`$p`"
        case OrcPath(p) => s"orc.`$p`"
        case BinaryPath(p, _) => s"binaryFile.`$p`"
      })
    })
  }

  /** What a compiled ref to `dep` reads (dbt-compile semantics): the
    * 2-part physical name for physically-materialized models and
    * snapshots; an INLINED parenthesized subquery for ephemeral SQL
    * models (dbt inlines ephemerals — a physical name would reference a
    * relation that never exists); the catalog-view name for SQL views
    * whose dependencies are all physical (those become real views), else
    * the session temp-view name the materializer actually creates. */
  private def compiledRelation(dep: String, inlining: Set[String]): String =
    models.get(versionedName(dep, None)) match {
      case Some(dm) => dm.config.materialized match {
        case Materialization.Ephemeral => dm.sqlText match {
          case Some(depSql) =>
            if (inlining.contains(dm.name)) throw new IllegalStateException(
              s"ref cycle while inlining ephemeral '$dep' in compile")
            "(" + substitutePhysical(depSql, inlining + dm.name) + ")"
          case None => throw new UnsupportedOperationException(
            s"compile: ref('$dep') targets an ephemeral DataFrame model — " +
              "no SQL text to inline; materialize it or declare it as a " +
              "sqlModel")
        }
        case Materialization.View
            if Materializer.persistentViewSql(this, dm).isEmpty =>
          physicalName(dm).replace(".", "__") // session temp view
        case _ => physicalName(dm)
      }
      case None if snapshots.contains(dep) => physicalName(snapshots(dep))
      case _ => throw new NoSuchElementException(s"unknown model '$dep'")
    }

  private[engine] def hasAnalysis(name: String): Boolean =
    analyses.contains(name)

  private val analysisResolved = mutable.Map[String, DataFrame]()
  /** Resolve an analysis to its (never-materialized) plan — memoized;
    * records its ref/source edges like a model build. Used by compile()
    * and docs column introspection. */
  private[engine] def resolveAnalysis(name: String): DataFrame =
    analysisResolved.getOrElseUpdate(name, {
      val a = analyses.getOrElse(name,
        throw new NoSuchElementException(s"unknown analysis '$name'"))
      a.build(ctxFor(a.id))
    })

  /** Force-resolve everything and return the introspectable graph. */
  def compile(): ProjectGraph = {
    models.keys.foreach(resolve)
    snapshots.keys.foreach(resolveSnapshotFresh) // records snapshot edges
    analyses.keys.foreach(resolveAnalysis) // compiled, never run
    val testNodes = tests.map(t => t.id -> (t: Node))
    tests.foreach(t => recordEdge(t.id, testTargetId(t.modelName)))
    ProjectGraph(
      (models.values.map(m => m.id -> (m: Node)) ++
        sources.values.map(s => s.id -> (s: Node)) ++
        seeds.values.map(s => s.id -> (s: Node)) ++
        snapshots.values.map(s => s.id -> (s: Node)) ++
        analyses.values.map(a => a.id -> (a: Node)) ++ testNodes).toMap,
      edges.map { case (k, v) => k -> v.toSet }.toMap)
  }

  // ---- run: topo order, bounded parallelism, test interleaving ---------

  /** `dbt build` analogue: like [[run]], but a failing test on a model
    * marks every downstream model skipped (`README.md:280`). */
  def build(select: String = "*"): RunResults =
    run(select, blockOnTestFailure = true)

  private val runStartHooks = mutable.ArrayBuffer[String]()
  private val runEndHooks = mutable.ArrayBuffer[String]()
  /** dbt `on-run-start` / `on-run-end` hooks: SQL executed once around
    * every run()/build() (audit rows, session setup, GRANT emulation). */
  def onRunStart(sql: String): this.type = { runStartHooks += sql; this }
  def onRunEnd(sql: String): this.type = { runEndHooks += sql; this }

  /** Build selected nodes (default: everything) in dependency order with
    * at most `target.threads` concurrent node builds. Tests run right
    * after their model; with `blockOnTestFailure` (the `dbt build`
    * contract) a test failure marks downstream models skipped, while the
    * plain-`run` contract lets models proceed. `exclude` subtracts a
    * second selector (dbt `--exclude`); `fullRefresh` drops each selected
    * incremental/insert-overwrite table so it rebuilds from scratch
    * (dbt `--full-refresh`). */
  def run(select: String = "*", blockOnTestFailure: Boolean = false,
      previousManifest: Option[Map[String, String]] = None,
      exclude: String = "", fullRefresh: Boolean = false): RunResults = {
    val graph = compile()
    val modified = previousManifest.map(modifiedSince).getOrElse(Set.empty)
    val included = Selector.select(graph, select, modified)
    val excluded: String => Boolean =
      if (exclude.isEmpty) _ => false
      else Selector.select(graph, exclude, modified)
    val selected: String => Boolean = id => included(id) && !excluded(id)
    if (fullRefresh) models.values.foreach { m =>
      val refreshable = m.config.materialized match {
        case _: Materialization.Incremental |
             _: Materialization.InsertOverwrite |
             _: Materialization.StreamingTable => true
        case _ => false
      }
      if (refreshable && selected(m.id)) {
        // resolve the checkpoint path BEFORE dropping the table: an
        // undeletable (non-local) checkpoint must abort while the table
        // still exists — dropping first and then failing would leave the
        // retained-offsets + missing-table state where the next run
        // rebuilds a permanently incomplete table
        val streamingCkptDir = m.config.materialized match {
          case Materialization.StreamingTable(ckpt) =>
            Some(Materializer.checkpointLocalPath(spark,
              Materializer.streamingCheckpointPath(this, m, ckpt)))
          case _ => None
        }
        spark.sql(s"DROP TABLE IF EXISTS ${physicalName(m)}")
        streamingCkptDir.foreach(Materializer.deleteRecursively)
      }
    }
    runStartHooks.foreach(spark.sql(_).collect())
    // analyses are compile-only resources: no dbt command executes them
    val order = graph.topoOrder.filter(selected)
      .filterNot(id => graph.nodes(id).isInstanceOf[Analysis])
    val pool = Executors.newFixedThreadPool(math.max(1, target.threads))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futures = mutable.Map[String, Future[NodeResult]]()
    // dbt-build interleaving: a model also waits on its upstream models'
    // tests, so a failing test blocks the downstream subgraph. Tests
    // themselves only wait on their model (no test-to-test edges — two
    // tests of one model must not deadlock on each other).
    val testsByModel: Map[String, Seq[String]] =
      tests.toSeq.groupBy(t => testTargetId(t.modelName))
        .map { case (m, ts) => m -> ts.map(_.id) }

    def nodeFuture(id: String): Future[NodeResult] =
      futures.getOrElseUpdate(id, {
        val base = graph.upstream(id).toSeq
        val ups = graph.nodes(id) match {
          case _ if !blockOnTestFailure => base
          case _: DataTest => base
          case _ => (base ++ base.flatMap(testsByModel.getOrElse(_, Nil))).distinct
        }
        val upstreamF = Future.sequence(ups.filter(selected).map(nodeFuture))
        upstreamF.map { ups =>
          if (ups.exists(r => r.status == "error" || r.status == "fail"))
            NodeResult(id, "skipped", 0, "upstream failure")
          else runNode(graph.nodes(id))
        }
      })

    try {
      order.foreach(nodeFuture)
      val all = Await.result(
        Future.sequence(order.map(futures)), Duration.Inf)
      RunResults(all)
    } finally {
      pool.shutdown()
      // end hooks run even on failure, but must never MASK the run's
      // outcome (a throwing audit INSERT should not discard RunResults
      // or replace the primary exception)
      runEndHooks.foreach { sql =>
        try spark.sql(sql).collect()
        catch { case e: Exception =>
          System.err.println(s"[graft] on-run-end hook failed: ${e.getMessage}")
        }
      }
    }
  }

  private def runNode(node: Node): NodeResult = {
    val t0 = System.nanoTime()
    def ms = (System.nanoTime() - t0) / 1000000
    try {
      node match {
        case m: Model =>
          spark.sparkContext.setJobGroup(m.id, QueryTags.tagFor(target, m))
          try Materializer.materialize(this, m)
          finally spark.sparkContext.clearJobGroup()
          NodeResult(m.id, "success", ms)
        case s: Seed =>
          Materializer.loadSeed(this, s)
          NodeResult(s.id, "success", ms)
        case s: Snapshot =>
          // fresh query built with EXEC-time resolution (reads
          // materialized upstreams, which topo order has already built)
          val fresh = s.build(execCtxFor(s.id, mutable.Map()))
          Materializer.snapshot(this, physicalName(s), fresh,
            s.uniqueKey, s.checkCols, s.asOf(), s.partitions)
          NodeResult(s.id, "success", ms)
        case t: DataTest =>
          val viol = t.violations(materializedDf(t.modelName))
          val n = viol.limit(1).count()
          if (n == 0) NodeResult(t.id, "success", ms)
          else failuresSchema match {
            case Some(schema) =>
              // dbt store_failures: persist the violations for inspection
              spark.sql(s"CREATE DATABASE IF NOT EXISTS `$schema`")
              val audit = s"$schema.${Ident.normalize(t.name)}"
              viol.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
                .format("parquet").saveAsTable(audit)
              NodeResult(t.id, "fail", ms, s"violations stored in $audit")
            case None => NodeResult(t.id, "fail", ms, "violations present")
          }
        case _: SourceDef =>
          NodeResult(node.id, "success", ms)
        case a: Analysis => // defensive: run() never schedules analyses
          NodeResult(a.id, "success", ms, "analysis: compile-only")
      }
    } catch {
      case e: Exception => NodeResult(node.id, "error", ms, String.valueOf(e.getMessage))
    }
  }

  // ---- state manifest: stable logic hashes for state:modified+ ---------

  /** Stable hash of each model's (and snapshot's fresh-query) logic:
    * sha256 over the *canonicalized analyzed plan*, so renames of
    * intermediate aliases or attribute-id churn don't count as
    * modifications but any real logic/source change does (SURVEY §7.4.4). */
  def manifest: Map[String, String] = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
    def hash(df: DataFrame): String = digest.digest(
      df.queryExecution.analyzed.canonicalized.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    models.keys.map(n => n -> hash(resolve(n))).toMap ++
      snapshots.keys.map(n => n -> hash(resolveSnapshotFresh(n))).toMap
  }

  def writeManifest(path: String): Unit = {
    val json = manifest.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": "$v"""" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** Model names whose logic hash differs from (or is absent in) the
    * given previous manifest. */
  def modifiedSince(previous: Map[String, String]): Set[String] =
    manifest.collect {
      case (name, h) if !previous.get(name).contains(h) => name
    }.toSet

  /** The DataFrame a downstream consumer/test should read for a model:
    * the materialized relation if one exists, else the exec-resolved plan
    * (which itself reads materialized upstreams — dbt ref semantics). */
  def materializedDf(name: String): DataFrame = models.get(name) match {
    case Some(m) => m.config.materialized match {
      case Materialization.Ephemeral => resolveForRun(name)
      case Materialization.View => resolveForRun(name) // view == same plan
      case _ => spark.table(physicalName(m))
    }
    case None if snapshots.contains(name) => // tests target snapshots too
      spark.table(physicalName(snapshots(name)))
    case None =>
      throw new NoSuchElementException(s"unknown model/snapshot '$name'")
  }

  /** Graph id a data test (or selector name) attached to `name` points
    * at: the model if one exists, else the snapshot. */
  private def testTargetId(name: String): String =
    if (!models.contains(name) && snapshots.contains(name)) s"snapshot.$name"
    else s"model.$name"

  /** `dbt test`: evaluate data tests against EXISTING relations without
    * materializing any model — `test` must not run models as a side
    * effect (ephemeral/view targets are evaluated from their plans). */
  def testOnly(select: String = "*"): RunResults = {
    val graph = compile()
    val selected = Selector.select(graph, select)
    RunResults(tests.toSeq.filter(t => selected(t.id)).map(runNode))
  }
}

object Project {
  private[engine] val RefPat =
    raw"\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}".r
  private[engine] val SrcPat =
    raw"\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}".r

  /** Declare-time lints for SQL-text models — the dbt-checkpoint hooks
    * the reference runs before SQL ever reaches the engine
    * (`.pre-commit-config.yaml:7-10`):
    *   - `check-script-semicolon`: a trailing `;` would break the DDL
    *     wrapping (`CREATE ... AS <sql>;`), so it fails at declare time
    *     with a lint message instead of a run-time Spark parse error;
    *   - `dbt-parse`: syntax-check the placeholder-substituted text with
    *     Spark's SQL parser (parse only; names resolve at build).
    * The third hook, no-hard-coded-names, is the advisory
    * [[Macros.evaluateProject]] lint — it stays advisory because the
    * reference runs the evaluator `|| true`. */
  private[engine] def lintSqlModel(spark: org.apache.spark.sql.SparkSession,
      name: String, sql: String): Unit = {
    val noComments = sql
      .replaceAll("(?s)/\\*.*?\\*/", " ")
      .replaceAll("--[^\n]*", " ")
    if (noComments.trim.endsWith(";"))
      throw new IllegalArgumentException(
        s"sql lint [$name]: trailing semicolon (check-script-semicolon) " +
          "- remove it; model SQL gets wrapped in DDL")
    val templated = SrcPat.replaceAllIn(
      RefPat.replaceAllIn(sql, "graft_tmpl"), "graft_tmpl")
    try org.apache.spark.sql.GraftSql.parse(spark, templated)
    catch { case e: Exception =>
      throw new IllegalArgumentException(
        s"sql lint [$name]: does not parse (dbt-parse): ${e.getMessage}")
    }
  }
}

/** Node-selection mini-language: `*`, `name`, `+name` (ancestors),
  * `name+` (descendants), `tag:x`, `state:modified` /
  * `state:modified+` (vs a previous manifest) — SURVEY.md §3.1 stage 4. */
object Selector {
  def select(graph: ProjectGraph, expr: String,
      modified: Set[String] = Set.empty): String => Boolean = {
    if (expr == "*") return _ => true
    val down = graph.edges.toSeq
      .flatMap { case (id, ups) => ups.map(_ -> id) }
      .groupMap(_._1)(_._2)
    // bare names address models first, then snapshots/seeds (dbt selects
    // any resource kind by name)
    def nodeId(e: String): String =
      Seq(s"model.$e", s"snapshot.$e", s"seed.$e", s"analysis.$e")
        .find(graph.nodes.contains).getOrElse(s"model.$e")
    def closure(start: Set[String], next: String => Iterable[String]): Set[String] = {
      var acc = start
      var frontier = start
      while (frontier.nonEmpty) {
        val more = frontier.flatMap(next).diff(acc)
        acc ++= more
        frontier = more
      }
      acc
    }
    val ids: Set[String] = expr match {
      case "state:modified" => modified.map(nodeId)
      case "state:modified+" =>
        closure(modified.map(nodeId), id => down.getOrElse(id, Nil))
      case e if e.startsWith("tag:") =>
        val tag = e.stripPrefix("tag:")
        graph.nodes.collect {
          case (id, m: Model) if m.config.tags.contains(tag) => id
          case (id, s: Snapshot) if s.config.tags.contains(tag) => id
        }.toSet
      case e if e.startsWith("+") =>
        closure(Set(nodeId(e.drop(1))), graph.upstream(_))
      case e if e.endsWith("+") =>
        closure(Set(nodeId(e.dropRight(1))), id => down.getOrElse(id, Nil))
      case e => Set(nodeId(e))
    }
    // tests of selected nodes ride along (a test's sole upstream edge is
    // its target — model or snapshot)
    val withTests = ids ++ graph.nodes.collect {
      case (tid, _: DataTest) if graph.upstream(tid).exists(ids.contains) => tid
    }
    withTests.contains _
  }
}

/** Query-tagging analogue of the reference's yuki_snowflake_dbt_tags
  * package (`README.md:102-105`): every model build runs under a job
  * group whose description is a JSON tag {job, model, materialization,
  * invocation_id} — recoverable from the Spark event log / listeners. */
object QueryTags {
  val invocationId: String = java.util.UUID.randomUUID().toString
  def tagFor(target: Target, m: Model): String = {
    val mat = m.config.materialized.toString.toLowerCase
    s"""{"job":"${target.name}","dbt_model":"${m.name}","materialization":"$mat","invocation_id":"$invocationId"}"""
  }
}
