package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end reference workflow over the TPC-H parquet at sf0.001:
  * sources → SQL-text staging views → contracted mart table → incremental
  * fact → tests → selectors — one project, one build, checked against
  * direct computation. The shape mirrors the reference template's
  * source→staging→mart convention (README.md:16, models/sources.yml). */
class WorkflowSpec extends SparkSpec {

  test("sources -> staging -> marts pipeline builds and matches direct SQL") {
    val p = new Project(spark, Target("dev", "wh", threads = 4))
      .storeFailuresIn("wh_audit")

    p.source("tpch", "orders", ParquetPath(s"$sf0001/orders.parquet"))
    p.source("tpch", "customer", ParquetPath(s"$sf0001/customer.parquet"))

    // staging: SQL-text views (1:1 base layer, codegen convention)
    p.sqlModel("stg_orders")(
      """SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
         FROM {{ source('tpch', 'orders') }}""")
    p.sqlModel("stg_customers")(
      "SELECT c_custkey, c_name, c_nationkey FROM {{ source('tpch', 'customer') }}")

    // mart: contracted table joining the two staging views
    p.model("cust_spend", ModelConfig(
      materialized = Materialization.Table,
      contract = Some(Seq(
        "c_custkey" -> "bigint", "c_name" -> "string",
        "n_orders" -> "bigint", "total_spend" -> "double")))) { ctx =>
      ctx.ref("stg_orders")
        .join(ctx.ref("stg_customers"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")).cast("double").as("total_spend"))
    }

    // incremental fact over the mart's upstream (max-key filter pattern)
    p.model("fct_orders", ModelConfig(
      materialized = Materialization.Incremental(Some(Seq("o_orderkey"))))) {
      ctx => ctx.ref("stg_orders").select("o_orderkey", "o_custkey", "o_totalprice")
    }

    p.testNotNull("cust_spend", "c_custkey")
    p.testUnique("cust_spend", "c_custkey")
    p.testUniqueCombination("fct_orders", Seq("o_orderkey"))
    p.testRelationship("fct_orders", "o_custkey", "stg_customers", "c_custkey")
    p.testExpressionIsTrue("cust_spend", "spend_nonneg", "total_spend >= 0")

    val res = p.build()
    assert(res.ok, res.results.filterNot(_.status == "success").mkString("; "))

    // numbers match direct computation over the raw parquet
    val direct = spark.read.parquet(s"$sf0001/orders.parquet")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"),
        count(lit(1))).first()
    val mart = spark.table("wh.cust_spend")
      .agg(sum("total_spend"), sum("n_orders")).first()
    assert(math.abs(mart.getDouble(0) - direct.getDouble(0)) < 1e-6)
    assert(mart.getLong(1) == direct.getLong(1))

    // staging views materialized as catalog views (persistent-view path
    // requires physical deps; sources are parquet paths, so temp views)
    assert(spark.table("wh.cust_spend").columns.length == 4)
    // incremental rerun appends nothing (same keys)
    assert(p.run("fct_orders").ok)
    assert(spark.table("wh.fct_orders").count() ==
      spark.read.parquet(s"$sf0001/orders.parquet").count())

    // selector: mart + ancestors only
    val g = p.compile()
    val sel = Selector.select(g, "+cust_spend")
    assert(sel("model.cust_spend") && sel("model.stg_orders") &&
      !sel("model.fct_orders"))

    // evaluator: clean project has no hard-coded references
    assert(!Macros.evaluateProject(g).exists(_.contains("hard_coded_reference")))
  }
}
