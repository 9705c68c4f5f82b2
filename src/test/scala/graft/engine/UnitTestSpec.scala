package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dbt-core 1.8 `unit_tests:` semantics: a model's build runs against
  * MOCKED refs/sources only, compared to expected rows as a multiset. */
class UnitTestSpec extends SparkSpec {
  import spark.implicits._

  private def newProject(schema: String): Project =
    new Project(spark, Target("dev", schema, threads = 2))

  test("passing unit test: mocked ref + source, multiset compare") {
    val p = newProject("ut1")
    p.source("raw", "orders", ParquetPath("/nonexistent/never/read"))
    p.model("enriched") { ctx =>
      ctx.ref("customers")
        .join(ctx.source("raw", "orders"), "cust_id")
        .groupBy(col("cust_id"), col("name"))
        .agg(sum(col("amt")).as("total"))
    }
    p.unitTest("enriched_totals", "enriched",
      given = Map(
        "customers" -> Seq((1L, "ada"), (2L, "bob")).toDF("cust_id", "name"),
        "source.raw.orders" -> Seq((1L, 10L), (1L, 5L), (2L, 7L))
          .toDF("cust_id", "amt")),
      expect = Seq((1L, "ada", 15L), (2L, "bob", 7L))
        .toDF("cust_id", "name", "total"))
    val rs = p.runUnitTests()
    assert(rs.map(r => (r.name, r.ok)) == Seq(("enriched_totals", true)), rs)
    assert(rs.head.missing == 0 && rs.head.unexpected == 0)
  }

  test("failing expectation reports missing and unexpected rows") {
    val p = newProject("ut2")
    p.model("ident") { ctx => ctx.ref("in") }
    p.unitTest("wrong", "ident",
      given = Map("in" -> Seq(1, 2, 2).toDF("v")),
      expect = Seq(1, 2, 3).toDF("v"))
    val r = p.runUnitTests().head
    assert(!r.ok)
    assert(r.missing == 1 && r.unexpected == 1, r) // 3 missing, extra 2
    assert(r.detail.nonEmpty)
  }

  test("unmocked ref fails actionably without touching relations") {
    val p = newProject("ut3")
    p.model("needs_two") { ctx =>
      ctx.ref("a").unionByName(ctx.ref("b"))
    }
    p.unitTest("partial", "needs_two",
      given = Map("a" -> Seq(1).toDF("v")),
      expect = Seq(1).toDF("v"))
    val r = p.runUnitTests().head
    assert(!r.ok && r.detail.contains("not mocked") &&
      r.detail.contains("given: a"), r.detail)
  }

  test("column mismatch is its own failure mode") {
    val p = newProject("ut4")
    p.model("renamer") { ctx => ctx.ref("in").withColumnRenamed("v", "w") }
    p.unitTest("cols", "renamer",
      given = Map("in" -> Seq(1).toDF("v")),
      expect = Seq(1).toDF("v"))
    val r = p.runUnitTests().head
    assert(!r.ok && r.detail.contains("column mismatch"), r.detail)
  }

  test("versioned ref resolves to the mocked versioned name") {
    val p = newProject("ut5")
    p.model("dim_v1") { ctx => ctx.ref("nothing") }
    p.model("dim_v2") { ctx => ctx.ref("nothing") }
    p.model("use_latest") { ctx => ctx.ref("dim") } // -> dim_v2
    p.unitTest("latest", "use_latest",
      given = Map("dim_v2" -> Seq(42).toDF("v")),
      expect = Seq(42).toDF("v"))
    val r = p.runUnitTests().head
    assert(r.ok, r)
  }

  test("SQL-text models unit-test through the same mock context") {
    val p = newProject("ut6")
    p.sqlModel("sql_sum")(
      "SELECT k, sum(v) AS s FROM {{ ref('rows') }} GROUP BY k")
    p.unitTest("sql_sum_groups", "sql_sum",
      given = Map("rows" -> Seq(("a", 1L), ("a", 2L), ("b", 5L))
        .toDF("k", "v")),
      expect = Seq(("a", 3L), ("b", 5L)).toDF("k", "s"))
    val r = p.runUnitTests().head
    assert(r.ok, r)
  }

  test("isIncremental is false under the mock context (full-refresh branch)") {
    val p = newProject("ut7")
    p.model("inc", ModelConfig(materialized =
      Materialization.Incremental())) { ctx =>
      val base = ctx.ref("in")
      if (ctx.isIncremental) base.filter(col("v") > 100) else base
    }
    p.unitTest("inc_full", "inc",
      given = Map("in" -> Seq(1, 2).toDF("v")),
      expect = Seq(1, 2).toDF("v"))
    assert(p.runUnitTests().head.ok)
  }

  test("Cli test surfaces unit tests before data tests") {
    val p = newProject("ut8")
    // a real upstream must exist for the project to compile (dbt's rule
    // too); the unit tests still only ever read the MOCK
    p.model("in") { ctx =>
      import ctx.spark.implicits._
      Seq(99).toDF("v")
    }
    p.model("m") { ctx => ctx.ref("in") }
    p.unitTest("m_ok", "m", Map("in" -> Seq(1).toDF("v")),
      Seq(1).toDF("v"))
    p.unitTest("m_bad", "m", Map("in" -> Seq(1).toDF("v")),
      Seq(2).toDF("v"))
    val out = Cli.run(p, Seq("test"))
    assert(out.exists(_.startsWith("PASS unit_test.m_ok")), out)
    assert(out.exists(_.startsWith("FAIL unit_test.m_bad")), out)
  }
}
