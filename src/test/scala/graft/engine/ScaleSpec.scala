package graft.engine

import graft.SparkSpec
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Scale-posture assertions on the PHYSICAL PLANS, not just results:
  * filters reach the parquet scan, small dims broadcast, bucketed tables
  * join without a shuffle, salting preserves semantics. */
class ScaleSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan (q06)") {
    val df = graft.SparkEntry.queries("q06_forecast_revenue")(spark, sf0001)
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:"), plan.take(500))
    assert(plan.contains("GreaterThanOrEqual(l_discount,0.05)") ||
      plan.contains("IsNotNull(l_discount)"), "l_discount filter not pushed")
  }

  test("column pruning: q06 scan reads only the needed columns") {
    val df = graft.SparkEntry.queries("q06_forecast_revenue")(spark, sf0001)
    val scan = planOf(df).linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("l_extendedprice") && !scan.contains("l_orderkey"),
      scan)
  }

  test("dimension joins broadcast (q02)") {
    val df = graft.SparkEntry.queries("q02_revenue_by_nation")(spark, sf0001)
    assert(planOf(df).contains("BroadcastHashJoin"))
  }

  test("bucketed tables join with zero exchanges") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force a sort-merge join — broadcast would hide the shuffle question
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = new Project(spark, Target("dev", "buck", threads = 2))
      p.model("fact_a", ModelConfig(materialized =
        Materialization.BucketedTable(Seq("k"), 4, Seq("k")))) { ctx =>
        import ctx.spark.implicits._
        (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "a")
      }
      p.model("fact_b", ModelConfig(materialized =
        Materialization.BucketedTable(Seq("k"), 4, Seq("k")))) { ctx =>
        import ctx.spark.implicits._
        (1 to 1000).map(i => (i.toLong % 40, i.toLong * 2)).toDF("k", "b")
      }
      assert(p.run().ok)
      val joined = spark.table("buck.fact_a").join(spark.table("buck.fact_b"), "k")
        .groupBy("k").agg(sum(col("a")), sum(col("b")))
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      // the same join over plain tables MUST shuffle — proves the bucketed
      // layout (not some other property) removed the exchanges
      spark.table("buck.fact_a").write.mode("overwrite").saveAsTable("buck.plain_a")
      spark.table("buck.fact_b").write.mode("overwrite").saveAsTable("buck.plain_b")
      val plainPlan = planOf(
        spark.table("buck.plain_a").join(spark.table("buck.plain_b"), "k")
          .groupBy("k").agg(sum(col("a")), sum(col("b"))))
      assert(plainPlan.contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("registry-wide plan lint: no hidden cartesian / nested-loop joins") {
    // Standing tripwire: every registered query's physical plan is walked,
    // and any CartesianProduct / BroadcastNestedLoopJoin outside the
    // justified allowlist fails the build — a future operator cannot ship
    // a hidden quadratic join. Justified exceptions:
    //  - x06: the labeled all-pairs exact-verification baseline (row-cap
    //    guarded; scale twin x31 is the production path)
    //  - x25: a SINGLE-ROW corpus-count table cross-joined under an
    //    explicit broadcast hint — a 1-row BNLJ is the cheapest way to
    //    attach a scalar to every row, not a quadratic join
    //  - x14: IVF cell assignment joins every vector against the
    //    BROADCAST nlist-row centroid table (index metadata, bounded by
    //    construction) — |corpus|·nlist work is the definition of IVF
    //    assignment, not an accidental cross join
    //  - x40/x45: same 1-row shape as x25 — the vocabulary-size scalar is
    //    attached via an explicit single-row broadcast (x45 composes x40)
    //  - x48: a GROUP-COUNT table (not corpus rows) cross-joins its own
    //    single-row weight total before broadcasting quotas
    val allow = Set("x06_embedding_neardups", "x25_tfidf_top_terms",
      "x14_ivf_ann", "x40_lm_bigram_nll", "x45_perplexity_buckets",
      "x48_temperature_resample")
    def offenders(plan: String): Seq[String] =
      Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
    // the lint must see the offending operator through AQE plan wrappers —
    // prove it on a deliberately-broken fixture before trusting the sweep
    val fixture = spark.range(5).crossJoin(spark.range(5))
    assert(offenders(planOf(fixture)).nonEmpty,
      "lint fixture: cross join not visible in the plan string")
    val nonEqui = spark.range(10).toDF("a")
      .join(spark.range(10).toDF("b"), col("a") < col("b"))
    assert(offenders(planOf(nonEqui)).nonEmpty,
      "lint fixture: non-equi join not visible in the plan string")
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => allow.contains(q._1))
      .flatMap { case (name, fn) =>
        val off = offenders(planOf(fn(spark, sf0001)))
        if (off.isEmpty) Nil else Seq(s"$name: ${off.mkString("+")}")
      }
    assert(bad.isEmpty,
      s"unexpected quadratic join shapes:\n${bad.mkString("\n")}")
  }

  test("shuffle budgets hold for representative one-pass queries") {
    // Pins the EXCHANGE COUNT (shuffles, not broadcasts) of queries whose
    // scaladoc claims a specific shuffle budget — a regression adding a
    // hidden shuffle to a "one hash agg" operator fails here, not in a
    // 100x-scale incident. Budgets include the final total-order sort.
    val budgets = Map(
      "q06_forecast_revenue" -> 1, // partial+final agg (single partition)
      "x01_dedup_exact" -> 2,      // one hash agg + order-by range
      "x08_token_counts" -> 1,     // per-row expressions + order-by
      "x23_quantize_embeddings" -> 1, // per-row expressions + order-by
      "x22_hash_split" -> 3,       // zero-shuffle assignment, then
                                   // agg + share-window + order-by
      "x42_chunk_documents" -> 1,  // per-row array exprs + order-by only
      "x41_weighted_sample" -> 2,  // map-side key, rank window + order-by
      "x47_corpus_stats" -> 3)     // agg + the countDistinct expand's
                                   // second exchange + order-by
    // shuffle exchanges only: not BroadcastExchange, and not ReusedExchange
    // lines (their simpleString embeds the reused child's 'Exchange ...'
    // text, which would double-count) — filter line-wise, then match
    val shuffleEx =
      "(?<!Broadcast)Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    for ((name, maxEx) <- budgets) {
      val plan = planOf(graft.SparkEntry.queries(name)(spark, sf0001))
      val n = plan.linesIterator
        .filterNot(_.contains("ReusedExchange"))
        .map(l => shuffleEx.findAllIn(l).size).sum
      assert(n <= maxEx, s"$name: $n shuffles (budget $maxEx)\n$plan")
    }
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val left = (1 to 2000).map(i => (if (i % 3 == 0) 1L else i.toLong % 100, i))
      .toDF("k", "v")
    val right = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "name")
    val got = Skew.saltedJoin(left, right, "k", factor = 8)
      .select("k", "v", "name")
    val want = left.join(right, "k").select("k", "v", "name")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == want.count())
  }

  test("two-phase aggregation equals direct aggregation") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 7L, i.toLong)).toDF("k", "v")
    val got = Skew.twoPhaseAgg(df, "k", factor = 4,
      partial = Seq(("v", "sum"), ("v", "count")),
      finalAgg = Seq(("total", "sum"), ("cnt", "sum")))
    val want = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("cnt"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("concurrent insert-overwrite builds don't leak dynamic mode") {
    // Two InsertOverwrite models racing under threads=4 next to a plain
    // Table model: the SessionConf lock must (a) keep each dynamic
    // overwrite correct (other partitions survive), (b) leave the
    // session conf at its original value afterwards.
    val key = "spark.sql.sources.partitionOverwriteMode"
    val before = spark.conf.getOption(key)
    var batch = Seq(("p1", 1L), ("p2", 2L))
    def proj(): Project = {
      val p = new Project(spark, Target("dev", "confrace", threads = 4))
      for (i <- 1 to 2)
        p.model(s"iow_$i", ModelConfig(materialized =
          Materialization.InsertOverwrite(Seq("part")))) { ctx =>
          import ctx.spark.implicits._
          batch.toDF("part", "v")
        }
      p.model("plain_tbl",
        ModelConfig(materialized = Materialization.Table)) { ctx =>
        import ctx.spark.implicits._
        Seq(1, 2, 3).toDF("x")
      }
      p
    }
    assert(proj().run().ok)
    batch = Seq(("p2", 42L)) // second run: rewrite p2 only, keep p1
    assert(proj().run().ok)
    for (i <- 1 to 2) {
      val rows = spark.table(s"confrace.iow_$i").select("part", "v")
        .orderBy("part")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq("p1" -> 1L, "p2" -> 42L), s"iow_$i: $rows")
    }
    assert(spark.table("confrace.plain_tbl").count() == 3)
    assert(spark.conf.getOption(key) == before,
      "partitionOverwriteMode leaked into the session")
  }

  test("insert-overwrite incremental rewrites only incoming partitions") {
    var day = "2024-01-01"
    def proj(): Project = {
      val p = new Project(spark, Target("dev", "iow", threads = 2))
      p.model("daily", ModelConfig(materialized =
        Materialization.InsertOverwrite(Seq("day")))) { ctx =>
        import ctx.spark.implicits._
        Seq((1L, day)).toDF("v", "day")
      }
      p
    }
    assert(proj().run().ok)
    day = "2024-01-02"
    assert(proj().run().ok)
    // rewrite day 2 with a new value; day 1 must survive untouched
    val p3 = new Project(spark, Target("dev", "iow", threads = 2))
    p3.model("daily", ModelConfig(materialized =
      Materialization.InsertOverwrite(Seq("day")))) { ctx =>
      import ctx.spark.implicits._
      Seq((42L, "2024-01-02")).toDF("v", "day")
    }
    assert(p3.run().ok)
    val rows = spark.table("iow.daily").orderBy("day")
      .collect().map(r => (r.getAs[String]("day"), r.getAs[Long]("v")))
    assert(rows.toSeq == Seq("2024-01-01" -> 1L, "2024-01-02" -> 42L))
  }
}
