package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MacrosSpec extends SparkSpec {

  private def df1 = {
    import spark.implicits._
    Seq((1, 10.0, "n1")).toDF("id", "amount", "note")
  }
  private def df2 = {
    import spark.implicits._
    Seq((2L, 20.0, "2026-01-01")).toDF("id", "amount", "archived_at")
  }

  test("unionRelations: null padding, provenance, loose type coercion") {
    val u = Macros.unionRelations(Seq("cur" -> df1, "hist" -> df2))
    assert(u.columns.toSeq ==
      Seq("id", "amount", "note", "archived_at", "_dbt_source_relation"))
    // int vs bigint id → widened to bigint (Snowflake-loose, FIXTURES A5)
    assert(u.schema("id").dataType == LongType)
    val rows = u.orderBy("id").collect()
    assert(rows(0).getString(2) == "n1" && rows(0).isNullAt(3))
    assert(rows(1).isNullAt(2) && rows(1).getString(3) == "2026-01-01")
    assert(rows.map(_.getString(4)).toSeq == Seq("cur", "hist"))
  }

  test("starFromRelations: superset, except, alias") {
    val cols = Macros.starFromRelations(Seq(df1, df2), except = Set("NOTE"))
    assert(cols.length == 3) // id, amount, archived_at (note dropped, case-insensitive)
    val aliased = Macros.starFromRelations(Seq(df1), relationAlias = Some("r"))
    val out = df1.alias("r").select(aliased: _*)
    assert(out.columns.toSeq == Seq("id", "amount", "note"))
  }

  test("starFromRelations quotes identifiers: dotted/spaced names resolve") {
    import spark.implicits._
    // a dotted column name would parse as a struct-field path unquoted,
    // and a spaced one would not parse at all (star_from_relations.sql:20
    // adapter.quotes every column)
    val weird = Seq((1, "a", 2.0)).toDF("the.id", "a name", "plain")
    val cols = Macros.starFromRelations(Seq(weird))
    assert(weird.select(cols: _*).columns.toSeq ==
      Seq("the.id", "a name", "plain"))
    val aliased = Macros.starFromRelations(Seq(weird),
      relationAlias = Some("w"))
    val out = weird.alias("w").select(aliased: _*)
    assert(out.collect().head.toSeq == Seq(1, "a", 2.0))
  }

  test("listOrphanedObjects: catalog-vs-graph diff, print-only") {
    val p = new Project(spark, Target("dev", "orph"))
    p.model("kept", ModelConfig(materialized = Materialization.Table)) { ctx =>
      import ctx.spark.implicits._; Seq(1).toDF("x")
    }
    assert(p.run().ok)
    // plant an orphan the graph doesn't know about
    spark.sql("CREATE DATABASE IF NOT EXISTS orph")
    import spark.implicits._
    Seq(1).toDF("x").write.mode("overwrite").saveAsTable("orph.zombie")
    val g = p.compile()
    val lines = Macros.listOrphanedObjects(spark, g, p, "orph",
      outputDropCmd = true, outputRenameCmd = true)
    assert(lines.exists(_.contains("orphaned: TABLE orph.zombie")))
    assert(lines.exists(_.startsWith("DROP TABLE orph.zombie")))
    assert(lines.exists(_.contains("RENAME TO orph._to_delete_zombie")))
    assert(!lines.exists(_.contains("orph.kept")))
    // safety invariant: nothing was executed
    assert(spark.catalog.tableExists("orph.zombie"))
  }

  test("cloneWarehouse copies tables readable from the clone") {
    val p = new Project(spark, Target("dev", "clonesrc", threads = 2))
    p.model("t1", ModelConfig(materialized = Materialization.Table)) { ctx =>
      import ctx.spark.implicits._
      Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    }
    assert(p.run().ok)
    val dest = java.nio.file.Files.createTempDirectory("graft_clone")
    Macros.cloneWarehouse(spark, dest)
    val cloned = spark.read.parquet(s"$dest/clonesrc.db/t1")
    assert(cloned.count() == 2)
    assert(cloned.columns.toSeq == Seq("id", "v"))
  }

  test("generateModelYaml emits column stubs") {
    val y = Macros.generateModelYaml("m", df1)
    assert(y.contains("- name: id") && y.contains("data_type: int"))
  }

  test("generateSourceYaml and generateBaseModel scaffold from the catalog") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS cg_raw")
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite")
      .saveAsTable("cg_raw.events_raw")
    val y = Macros.generateSourceYaml(spark, "raw", "cg_raw")
    assert(y.contains("- name: raw") && y.contains("schema: cg_raw"))
    assert(y.contains("- name: events_raw") &&
      y.contains("data_type: bigint"), y)
    val sql = Macros.generateBaseModel(spark, "raw", "cg_raw", "events_raw")
    assert(sql.contains("{{ source('raw', 'events_raw') }}"))
    assert(sql.contains("    id,\n    v"), sql)
  }
}
