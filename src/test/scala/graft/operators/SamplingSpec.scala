package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("hashSplit is deterministic, exhaustive, and ~fraction-accurate") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val a = Sampling.hashSplit(df, "id") // 'cd' ~ 205/256 = 0.80
    val b = Sampling.hashSplit(df, "id")
    // deterministic: identical assignment across invocations
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    val trainShare = counts("train").toDouble / 2000
    assert(math.abs(trainShare - 205.0 / 256) < 0.03, s"share=$trainShare")
  }

  test("hashSample keeps a stable subset of the requested fraction") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val s1 = Sampling.hashSample(df, "id", "40") // 64/256 = 0.25
    val s2 = Sampling.hashSample(df, "id", "40")
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val n = s1.count().toDouble
    assert(math.abs(n / 2000 - 0.25) < 0.03, s"kept=$n")
    // subset property: a tighter threshold nests inside a looser one
    val tight = Sampling.hashSample(df, "id", "20")
    assert(tight.exceptAll(s1).isEmpty)
  }

  test("packByTokenBudget: bins start aligned, fill respects the budget") {
    import spark.implicits._
    // one shard so the fill order is the plain id order
    val df = Seq((1L, 800L), (2L, 800L), (3L, 800L), (4L, 3000L), (5L, 10L))
      .toDF("id", "n")
    val out = Sampling.packByTokenBudget(df, "id", "n",
      budget = 2048L, shards = 1)
      .select("id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // prefix sums: 0, 800, 1600, 2400, 5400 → bins 0,0,0,1,2
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
    // sharded: bin assignment depends only on (shard, id) — deterministic
    val big = (1L to 500L).map(i => (i, 100L)).toDF("id", "n")
    val p1 = Sampling.packByTokenBudget(big, "id", "n", 2048L, shards = 8)
    val p2 = Sampling.packByTokenBudget(big, "id", "n", 2048L, shards = 8)
    assert(p1.select("id", "shard", "bin")
      .exceptAll(p2.select("id", "shard", "bin")).isEmpty)
    // every bin's exclusive prefix within its shard stays under budget
    // per construction: docs per (shard,bin) * 100 tokens ≤ 2048 + one
    // straddling doc
    val maxFill = p1.groupBy("shard", "bin").agg(sum("n").as("fill"))
      .agg(max("fill")).first().getLong(0)
    assert(maxFill <= 2048L + 100L, s"fill=$maxFill")
  }

  test("packByTokenBudget: rejects clashing columns and bad ids") {
    import spark.implicits._
    // output-name collision fails at declare time, not silently overwrites
    val hasShard = Seq((1L, 10L, 9L)).toDF("id", "n", "shard")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.packByTokenBudget(hasShard, "id", "n", 2048L, shards = 2)
    }
    assert(e1.getMessage.contains("shard"))
    val hasBin = Seq((1L, 10L, 9L)).toDF("id", "n", "bin")
    intercept[IllegalArgumentException] {
      Sampling.packByTokenBudget(hasBin, "id", "n", 2048L, shards = 2)
    }
    // a non-castable id would hash every row into one null shard — raise
    val badId = Seq(("doc-a", 10L), ("doc-b", 20L)).toDF("id", "n")
    val e2 = intercept[Exception] {
      Sampling.packByTokenBudget(badId, "id", "n", 2048L, shards = 2).collect()
    }
    assert(e2.getMessage.contains("does not cast"), e2.getMessage)
    // numeric-string ids still work (castable)
    val okId = Seq(("1", 10L), ("2", 20L)).toDF("id", "n")
    assert(Sampling.packByTokenBudget(okId, "id", "n", 2048L, shards = 2)
      .count() == 2)
  }

  test("weightedSamplePerGroup: proportional, deterministic, weight-gated") {
    import spark.implicits._
    // 10 heavy (w=1000) vs 190 light (w=1) rows: a proportional sampler
    // picking 10 should select mostly heavy rows; a uniform one would
    // pick ~0.5 heavy in expectation
    val rows = (1L to 200L).map(i =>
      ("g", i, if (i <= 10) 1000L else 1L))
    val df = rows.toDF("grp", "id", "w")
    val got = Sampling.weightedSamplePerGroup(df, "grp", "id", "w", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.size == 10)
    val heavy = got.count(_ <= 10L)
    assert(heavy >= 7, s"only $heavy of 10 picks were heavy: $got")
    // deterministic across reruns
    val again = Sampling.weightedSamplePerGroup(df, "grp", "id", "w", k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got)
    // non-positive weights carry no sampling mass
    val withZero = (rows :+ (("g", 999L, 0L))).toDF("grp", "id", "w")
    val z = Sampling.weightedSamplePerGroup(withZero, "grp", "id", "w", k = 300)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!z.contains(999L) && z.size == 200)
  }

  test("temperatureResample: small groups upsampled, totals near budget, deterministic") {
    import spark.implicits._
    // big:small = 900:100; proportional keep of 100 would be 90:10, but
    // T=0.5 (weight n^2) skews hard toward big, T->0... use T=0.5 inverse:
    // weights 900^2 : 100^2 = 81 : 1 -> big dominates; T=2 (sqrt) gives
    // 30 : 10 -> small group's SHARE rises from 10% to 25%
    val rows = (1L to 900L).map(i => ("big", i)) ++
      (1001L to 1100L).map(i => ("small", i))
    val df = rows.toDF("src", "id")
    val kept = Sampling.temperatureResample(df, "src", "id",
      temperature = 2.0, budget = 100L)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum
    assert(total >= 100 && total <= 102, s"total $total (ceil slack only)")
    val smallShare = kept("small").toDouble / total
    assert(smallShare > 0.15, s"small share $smallShare not upsampled")
    // proportional baseline for contrast: T=1 keeps ~10% small
    val prop = Sampling.temperatureResample(df, "src", "id",
      temperature = 1.0, budget = 100L)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop("small") < kept("small"))
    // deterministic across reruns
    val again = Sampling.temperatureResample(df, "src", "id",
      temperature = 2.0, budget = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    val first = Sampling.temperatureResample(df, "src", "id",
      temperature = 2.0, budget = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == first)
    // working-column clash fails at declare time, like the sibling samplers
    val clashing = df.withColumn("quota", lit(1))
    assert(intercept[IllegalArgumentException] {
      Sampling.temperatureResample(clashing, "src", "id", 1.0, 10L)
    }.getMessage.contains("quota"))
  }

  test("hashSplit adds no shuffle: assignment is pure map-side") {
    import spark.implicits._
    val plan = Sampling.hashSplit((0L until 10L).toDF("id"), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("shardBySize: balanced totals, deterministic, full coverage") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0L until 200L).map(id => (id, 1L + rnd.nextInt(1000)))
    val df = rows.toDF("id", "sz")
    def run() = Sampling.shardBySize(df, "id", "sz", numShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run()
    assert(a.sameElements(run()), "sharding not deterministic")
    assert(a.map(_._1).toSet == rows.map(_._1).toSet, "doc lost or duplicated")
    val perShard = a.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    assert(perShard.keySet == (0L until 8L).toSet)
    // LPT-style round-robin: shard totals within ~one max-doc of each other
    val spread = perShard.values.max - perShard.values.min
    assert(spread <= rows.map(_._2).max,
      s"shard totals spread $spread exceeds one max-doc bound: $perShard")
    // counts differ by at most one (round-robin over ranks)
    val counts = a.groupBy(_._3).view.mapValues(_.size).values
    assert(counts.max - counts.min <= 1, counts.toSeq.sorted)
  }

  test("shardBySize: two-phase rank equals the global-window rank, distributed plan") {
    import spark.implicits._
    // heavy ties in sz + enough rows that the range partitioner spreads
    // the corpus over many partitions — the case where a buggy offset or
    // boundary would misnumber ranks across partition edges
    val rnd = new scala.util.Random(41)
    val rows = (0L until 3000L).map(id => (id, 1L + rnd.nextInt(40)))
    val df = rows.toDF("id", "sz").repartition(16)
    val got = Sampling.shardBySize(df, "id", "sz", numShards = 7)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("sz").desc, col("id"))
    val want = df.withColumn("shard",
      ((row_number().over(w) - 1) % 7).cast("long"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "two-phase rank diverges from the global-window reference")
    // and the production plan is the distributed one: no global window,
    // no single-partition exchange anywhere
    assert(graft.PlanAudit.globalWindowCount(got) == 0)
    assert(!got.queryExecution.executedPlan.toString
      .contains("Exchange SinglePartition"),
      "shardBySize still funnels through one partition")
  }

  test("shardBySize: internal column clash is rejected up front") {
    import spark.implicits._
    val clashing = Seq((1L, 2L, 3L)).toDF("id", "sz", "__sid")
    assert(intercept[IllegalArgumentException] {
      Sampling.shardBySize(clashing, "id", "sz", 4)
    }.getMessage.contains("__sid"))
  }

  test("shardBySize: duplicate and null ids fail loudly, not corrupt") {
    import spark.implicits._
    // a duplicate id would get TWO assignment rows and the join would
    // multiply it; pre-guard this silently doubled the doc
    val dup = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 5L)).toDF("id", "sz")
    val eDup = intercept[IllegalArgumentException] {
      Sampling.shardBySize(dup, "id", "sz", 2)
    }
    assert(eDup.getMessage.contains("not unique") &&
      eDup.getMessage.contains("hash sharding"), eDup.getMessage)
    // a null id would vanish through the equi-join
    val withNull = Seq((java.lang.Long.valueOf(1L), 10L),
      (null.asInstanceOf[java.lang.Long], 20L)).toDF("id", "sz")
    val eNull = intercept[IllegalArgumentException] {
      Sampling.shardBySize(withNull, "id", "sz", 2)
    }
    assert(eNull.getMessage.contains("null"), eNull.getMessage)
  }

  test("splitCrossings counts straddling pairs; component split is leak-free") {
    import spark.implicits._
    val docs = (0L until 100L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    // adversarial assignment: exactly two pairs straddle
    val assign = (0L until 100L).map(i =>
      (i, if (i == 2L || i == 4L) "holdout" else "train"))
      .toDF("doc_id", "split")
    val row = Sampling.splitCrossings(pairs, "doc_a", "doc_b", assign,
      "doc_id", "split", "fixed").head()
    assert(row.getAs[String]("method") == "fixed")
    assert(row.getAs[Long]("n_pairs") == 4L)
    assert(row.getAs[Long]("n_cross_split") == 2L)
    assert(!row.getAs[Boolean]("leak_free"))
    // component-keyed split over the pair components never straddles
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L),
      (6L, 5L), (7L, 7L), (8L, 7L)).toDF("v", "comp")
    val safe = Sampling.leakageSafeSplit(docs, "doc_id", comp)
      .select(col("doc_id"), col("split"))
    val safeRow = Sampling.splitCrossings(pairs, "doc_a", "doc_b", safe,
      "doc_id", "split", "safe").head()
    assert(safeRow.getAs[Long]("n_cross_split") == 0L &&
      safeRow.getAs[Boolean]("leak_free"))
  }

  test("leakageSafeSplit: no component straddles splits; singletons match hashSplit") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    // components: {0..9}->0, {10,11}->10; the rest are singletons
    val comp = ((0L until 10L).map(v => (v, 0L)) ++ Seq((10L, 10L), (11L, 10L)))
      .toDF("v", "comp")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", comp)
    // every component maps to exactly one split
    val perComp = out.groupBy("component")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(perComp == 0, "a component straddles splits")
    // singleton docs get exactly the plain hashSplit assignment
    val single = out.filter(col("doc_id") >= 12L)
      .select(col("doc_id"), col("split"))
    val plain = Sampling.hashSplit(docs.filter(col("doc_id") >= 12L), "doc_id")
      .select(col("doc_id"), col("split"))
    assert(single.exceptAll(plain).isEmpty && plain.exceptAll(single).isEmpty)
    // members of one component share the split of their label
    val zeroSplits = out.filter(col("component") === 0L)
      .select("split").distinct().as[String].collect().toSeq
    assert(zeroSplits.size == 1)
    assert(out.count() == 200)
  }

  test("semanticCellCap: cells are SRP signs, cap holds, md5-rank selects") {
    import spark.implicits._
    val dim = 8
    val vecs = (0L until 120L)
      .map(i => (i, Array.tabulate(dim)(d => ((i * 7 + d * 3) % 11 - 5).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Sampling.semanticCellCap(df, "vec_id", "embedding",
      dim, cellBits = 3, n = 5).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // cap holds per cell
    out.groupBy(_._2).foreach { case (cell, rows) =>
      assert(rows.size <= 5, s"cell $cell over cap")
    }
    // cells match a direct sign computation against the same hyperplanes
    val signs = Dedup.srpSigns(3, dim)
    val expectCell = vecs.map { case (id, v) =>
      id -> (0 until 3).map { p =>
        val d = BigDecimal((0 until dim).map(j => v(j).toDouble * signs(p)(j)).sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        if (d >= 0) "1" else "0"
      }.mkString
    }.toMap
    out.foreach { case (id, cell) =>
      assert(cell == expectCell(id), s"id $id cell $cell")
    }
    // selection within a cell = md5-rank prefix of that cell's members
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString
    expectCell.groupBy(_._2).foreach { case (cell, members) =>
      val want = members.keys.toSeq.sortBy(id => (md5hex(id.toString), id))
        .take(5).toSet
      val got = out.filter(_._2 == cell).keySet
      assert(got == want, s"cell $cell: $got vs $want")
    }
    // rerun keeps the SAME rows
    val again = Sampling.semanticCellCap(df, "vec_id", "embedding",
      dim, cellBits = 3, n = 5).collect().map(_.getLong(0)).toSet
    assert(again == out.keySet)
    // cell-column clash refused
    intercept[IllegalArgumentException] {
      Sampling.semanticCellCap(df.withColumn("cell", lit(1)),
        "vec_id", "embedding", dim, cellBits = 3, n = 5)
    }
  }

  test("tokenBudgetCap == the (prio desc, id) inclusive-prefix rule") {
    import spark.implicits._
    // rows: (group, id, prio, tokens)
    val rows = Seq(
      ("a", 1L, 9L, 40L), ("a", 2L, 9L, 30L),   // class 9: 70 total
      ("a", 3L, 5L, 20L), ("a", 4L, 5L, 25L),   // class 5: cutoff ties
      ("a", 5L, 1L, 10L),                        // beyond budget
      ("b", 6L, 7L, 100L),                       // alone over budget? no: =100
      ("b", 7L, 3L, 1L),
      ("c", 8L, 2L, 500L))                       // single too-big doc
    val df = rows.toDF("src", "id", "prio", "tok")
    def got(budget: Long): Map[String, Set[Long]] =
      Sampling.tokenBudgetCap(df, "src", "id", "prio", "tok", budget)
        .collect().map(r => r.getString(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def want(budget: Long): Map[String, Set[Long]] =
      rows.groupBy(_._1).view.mapValues { g =>
        val ordered = g.sortBy(r => (-r._3, r._2))
        val cums = ordered.scanLeft(0L)(_ + _._4).tail
        ordered.zip(cums).filter(_._2 <= budget).map(_._1._2).toSet
      }.toMap.map { case (k, v) => k -> v }
    for (b <- Seq(0L, 90L, 95L, 100L, 115L, 125L, 1000L)) {
      val g = got(b).filter(_._2.nonEmpty)
      val w = want(b).filter(_._2.nonEmpty)
      assert(g == w, s"budget $b: got $g want $w")
    }
    // budget 90: class-9 fully kept (70), cutoff class 5 has rem 20 —
    // only id 3 (20 tokens, lower id) fits; id 4 (25) and class 1 drop
    assert(got(90L)("a") == Set(1L, 2L, 3L))
    // a doc bigger than the whole budget yields an empty group
    assert(!got(100L).contains("c") || got(100L)("c").isEmpty)
  }

  test("stratifiedSplit: exact per-group counts, equals the rank rule, " +
      "deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(163)
    val rows = (1 to 700).map(i => (s"g${rnd.nextInt(5)}", i.toLong))
    val df = rows.toDF("src", "id")
    for (frac <- Seq(0L, 137000L, 500000L, 950000L, 1000000L)) {
      val got = Sampling.stratifiedSplit(df, "src", "id", frac)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2))
        .toMap
      // brute reference: the plain per-group (md5, id) rank rule
      val want = rows.groupBy(_._1).flatMap { case (g, members) =>
        val n = members.size
        val nTrain = n * frac / 1000000L
        members.sortBy(m => (graft.TestMd5.hex(m._2.toString), m._2))
          .zipWithIndex.map { case (m, i) =>
            (g, m._2) -> (if (i < nTrain) "train" else "holdout") }
      }
      assert(got == want, s"frac $frac mismatch")
      // exact counts, not approximate ones
      val counts = got.groupBy(_._1._1).map { case (g, m) =>
        g -> m.values.count(_ == "train") }
      val wantCounts = rows.groupBy(_._1).map { case (g, ms) =>
        g -> (ms.size * frac / 1000000L).toInt }
      assert(counts == wantCounts)
    }
  }

  test("stratifiedSplit: tiny strata get exact floors; straddle guard " +
      "fires loudly") {
    import spark.implicits._
    // a 3-row stratum at 50%: floor(1.5) = exactly 1 train row — the
    // probabilistic x22 rule cannot promise this
    val tiny = Seq(("t", 1L), ("t", 2L), ("t", 3L)).toDF("src", "id")
    val got = Sampling.stratifiedSplit(tiny, "src", "id", 500000L)
      .collect().map(_.getString(2))
    assert(got.count(_ == "train") == 1 && got.count(_ == "holdout") == 2)
    // single-hex buckets over 300 rows put ~19 rows in the straddling
    // bucket — past a maxTieClass of 2 the guard must name the class
    val big = (1 to 300).map(i => ("s", i.toLong)).toDF("src", "id")
    val e = intercept[Exception] {
      Sampling.stratifiedSplit(big, "src", "id", 500000L,
        bucketChars = 1, maxTieClass = 2L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("straddling bucket"), msg)
    // and with the default bound the same call is fine
    assert(Sampling.stratifiedSplit(big, "src", "id", 500000L,
      bucketChars = 1).collect().length == 300)
  }

  test("tokenBudgetCap: fractional prio/token columns fail loudly") {
    import spark.implicits._
    val frac = Seq(("a", 1L, 1.5, 10L)).toDF("src", "id", "prio", "tok")
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetCap(frac, "src", "id", "prio", "tok", 100L)
    }
    assert(e.getMessage.contains("'prio' must be integral"), e.getMessage)
    val frac2 = Seq(("a", 1L, 1L, 10.0)).toDF("src", "id", "prio", "tok")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetCap(frac2, "src", "id", "prio", "tok", 100L)
    }
    assert(e2.getMessage.contains("'tok' must be integral"), e2.getMessage)
  }

  test("tokenBudgetCap: null prio/token rows are excluded, not kept") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(9L), Some(40L)),
      ("a", 2L, None, Some(30L)),      // null prio
      ("a", 3L, Some(5L), None),       // null tokens
      ("a", 4L, Some(5L), Some(20L)))
      .toDF("src", "id", "prio", "tok")
    val kept = Sampling.tokenBudgetCap(df, "src", "id", "prio", "tok", 100L)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("tokenBudgetCap: degenerate cutoff tie class fails loudly") {
    import spark.implicits._
    // every row of the group shares one priority, and the budget lands
    // inside that class — the cutoff tie window's partition would be
    // the whole group (the funnel the decomposition avoids); guard it
    val df = (1 to 64).map(i => ("sat", i.toLong, 7L, 10L))
      .toDF("src", "id", "prio", "tok")
    val e = intercept[Exception] {
      Sampling.tokenBudgetCap(df, "src", "id", "prio", "tok",
        budget = 300L, maxTieClass = 32L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("cutoff tie class"), msg)
    assert(msg.contains("maxTieClass 32"), msg)
    // fully-kept classes never hit the guard: same degenerate group
    // under a budget that keeps ALL of it takes the no-window join path
    val all = Sampling.tokenBudgetCap(df, "src", "id", "prio", "tok",
      budget = 10L * 64, maxTieClass = 32L).collect()
    assert(all.length == 64)
    // and at the bound itself the cutoff guard stays silent
    val ok = Sampling.tokenBudgetCap(df, "src", "id", "prio", "tok",
      budget = 300L, maxTieClass = 64L)
      .select("id").as[Long].collect().toSet
    assert(ok == (1L to 30L).toSet) // 30 docs of 10 tokens fit 300
  }
}
