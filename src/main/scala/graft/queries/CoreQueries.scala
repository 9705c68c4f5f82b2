package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType, DoubleType}

/** Relational operator inventory (SURVEY.md §2.1–§2.7) expressed over the
  * driver test tables. Each query is the idiomatic declarative Spark form —
  * Catalyst does pushdown/pruning/join-strategy; dimension joins broadcast
  * automatically (dims are far below the 10 MB threshold at every sf).
  *
  * Reference semantics being covered (file:line cites are to
  * /root/reference): projections+filters (models/example/
  * my_second_dbt_model.sql:4-6), UNION ALL (my_first_dbt_model.sql:15),
  * union-by-name with null padding (macros/star_from_relations.sql:10-14),
  * group-by-all + avg/count observability shape (README.md:109-119),
  * anti-join diff (macros/list_orphaned_objects.sql:50), multi-column
  * ORDER BY (list_orphaned_objects.sql:31), JSON extraction
  * (README.md:115-116), date arithmetic (README.md:117).
  */
object CoreQueries extends QueryPack {

  private val D = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(D)
  /** Exact decimal sum, surfaced as double (bit-identical across engines). */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  val all: Seq[Q] = Seq(
    // ---- A1/A2/A3/O1: grouped aggregation (TPC-H Q1 shape) -------------
    Q("q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("1999-12-31").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            sum(dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount")))
              .cast(DoubleType).as("sum_disc_price"),
            sum((dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount")))
              .cast(DecimalType(18, 4)) * (lit(1).cast(D) + dec($"l_tax")))
              .cast(DoubleType).as("sum_charge"),
            (sum(dec($"l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
            (sum(dec($"l_extendedprice")).cast(DoubleType) / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- multi-way equi-join + agg (TPC-H Q5 shape; dims broadcast) ----
    Q("q02_revenue_by_nation",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(sum(dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some("""SELECT r_name, n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY revenue DESC, n_name""")),

    // ---- 6-way join with a cross-table join predicate (TPC-H Q5 shape:
    //      local-supplier volume — customer and supplier must share a
    //      nation, the classic join-order/broadcast-choice stressor).
    //      Facts shuffle on their keys; supplier/nation/region broadcast.
    Q("q05_local_supplier_volume",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val sup = t(s, dir, "supplier")
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        c.join(o.filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-01-01").cast("timestamp")),
            $"c_custkey" === $"o_custkey")
          .join(li, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(sup),
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .filter($"r_name" === "ASIA")
          .groupBy($"n_name")
          .agg(sum(dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some("""SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---- join + group + top-k (TPC-H Q3 shape) -------------------------
    Q("q03_top_open_orders",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        li.join(o.filter($"o_orderstatus" === "O"), $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(sum(dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount")))
            .cast(DoubleType).as("revenue"))
          .select($"o_orderkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
            $"o_orderpriority", $"revenue")
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        o_orderpriority,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // ---- semi-join existence count (TPC-H Q4 shape; J3) ----------------
    Q("q04_priority_with_returns",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val ret = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
          .select($"l_orderkey")
        o.join(ret, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- filtered sum, pure scan+filter pushdown (TPC-H Q6 shape; P5/P8)
    Q("q06_forecast_revenue",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
            $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
          .agg(sum(dec($"l_extendedprice") * dec($"l_discount"))
            .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        count(*) AS n_rows FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""")),

    // ---- CASE-conditional aggregation (TPC-H Q14 shape; F-family) ------
    Q("q07_promo_revenue_share",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem"); val p = t(s, dir, "part")
        val disc = dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount"))
        li.join(broadcast(p), $"l_partkey" === $"p_partkey")
          .agg(
            (sum(when($"p_type" === "PROMO", disc).otherwise(lit(0).cast(D)))
              .cast(DoubleType) * 100.0 /
              sum(disc).cast(DoubleType)).as("promo_share"),
            sum(when($"p_type" === "PROMO", disc).otherwise(lit(0).cast(D)))
              .cast(DoubleType).as("promo_revenue"))
      },
      Some("""SELECT
        CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
          / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_share,
        CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey""")),

    // ---- market-share two-level aggregate (TPC-H Q8 shape): nation's
    //      share of regional volume by year — an 8-relation join where
    //      nation joins twice under different roles, then a conditional
    //      share over exact decimal sums. Both sums are decimal-exact so
    //      the double division is order-independent across engines. ------
    Q("q08_market_share",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val sup = t(s, dir, "supplier")
        val p = t(s, dir, "part"); val r = t(s, dir, "region")
        val n1 = t(s, dir, "nation")
          .select($"n_nationkey".as("c_nkey"), $"n_regionkey".as("c_rkey"))
        val n2 = t(s, dir, "nation")
          .select($"n_nationkey".as("s_nkey"), $"n_name".as("nation"))
        val vol = dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount"))
        li.join(broadcast(p.filter($"p_type" === "PROMO")),
            $"l_partkey" === $"p_partkey")
          .join(o.filter($"o_orderdate".between(
              lit("1996-01-01").cast("timestamp"),
              lit("1997-12-31").cast("timestamp"))),
            $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n1), $"c_nationkey" === $"c_nkey")
          .join(broadcast(r), $"c_rkey" === $"r_regionkey")
          .filter($"r_name" === "AMERICA")
          .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n2), $"s_nationkey" === $"s_nkey")
          .groupBy(year($"o_orderdate").cast(LongType).as("o_year"))
          .agg((sum(when($"nation" === "NATION_1", vol).otherwise(lit(0).cast(D)))
            .cast(DoubleType) / sum(vol).cast(DoubleType)).as("mkt_share"))
          .orderBy($"o_year")
      },
      Some("""SELECT o_year,
        CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(sum(volume) AS DOUBLE) AS mkt_share
        FROM (SELECT year(o_orderdate) AS o_year,
                CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
                n2.n_name AS nation
              FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
                AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
        GROUP BY o_year ORDER BY o_year""")),

    // ---- join + group by computed year (TPC-H Q9 shape; F7/F8) ---------
    Q("q09_profit_by_nation_year",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val sup = t(s, dir, "supplier"); val n = t(s, dir, "nation")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name", year($"o_orderdate").cast(LongType).as("o_year"))
          .agg(sum(dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount")))
            .cast(DoubleType).as("amount"))
          .orderBy($"n_name", $"o_year".desc)
      },
      Some("""SELECT n_name, year(o_orderdate) AS o_year,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS amount
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate) ORDER BY n_name, o_year DESC""")),

    // ---- returned-item top customers (TPC-H Q10 shape; O2) -------------
    Q("q10_returned_revenue_by_customer",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
        li.filter($"l_returnflag" === "R")
          .join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"n_name")
          .agg(sum(dec($"l_extendedprice") * (lit(1).cast(D) - dec($"l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---- U1: positional UNION ALL (my_first_dbt_model.sql:15) ----------
    Q("q11_union_all_tiers",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val hi = o.filter($"o_totalprice" > 400000.0)
          .select($"o_orderkey".as("id"), lit("high").as("tier"))
        val lo = o.filter($"o_totalprice" < 10000.0)
          .select($"o_orderkey".as("id"), lit("low").as("tier"))
        hi.union(lo).orderBy($"id", $"tier")
      },
      Some("""SELECT * FROM (
        SELECT o_orderkey AS id, 'high' AS tier FROM orders WHERE o_totalprice > 400000.0
        UNION ALL
        SELECT o_orderkey AS id, 'low' AS tier FROM orders WHERE o_totalprice < 10000.0)
        ORDER BY id, tier""")),

    // ---- U2: union-by-name with null padding (dbt_utils.union_relations,
    //      star_from_relations.sql:10-14) --------------------------------
    Q("q12_union_by_name",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val a = o.filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_totalprice", lit("cur").as("src"))
        val b = o.filter($"o_orderstatus" === "O")
          .select($"o_orderkey", $"o_orderpriority", lit("hist").as("src"))
        a.unionByName(b, allowMissingColumns = true)
          .orderBy($"o_orderkey", $"src")
      },
      Some("""SELECT * FROM (
        SELECT o_orderkey, o_totalprice, 'cur' AS src FROM orders WHERE o_orderstatus = 'F'
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderpriority, 'hist' AS src FROM orders WHERE o_orderstatus = 'O')
        ORDER BY o_orderkey, src""")),

    // ---- A-family: DISTINCT --------------------------------------------
    Q("q13_distinct_status_priority",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").select($"o_orderstatus", $"o_orderpriority")
          .distinct().orderBy($"o_orderstatus", $"o_orderpriority")
      },
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        ORDER BY o_orderstatus, o_orderpriority""")),

    // ---- window: ranking (top-3 orders per customer) -------------------
    Q("q14_top3_orders_per_customer",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn".cast(LongType))
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ---- window: running aggregate (frame-exact, decimal) --------------
    Q("q15_running_customer_spend",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders").filter($"o_custkey" < 200)
          .select($"o_custkey", $"o_orderkey",
            sum(dec($"o_totalprice")).over(w).cast(DoubleType).as("running_spend"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders WHERE o_custkey < 200 ORDER BY o_custkey, o_orderkey""")),

    // ---- J2: anti-join (list_orphaned_objects.sql:50 semantics) --------
    Q("q16_customers_without_open_orders",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val open = t(s, dir, "orders").filter($"o_orderstatus" === "O")
          .select($"o_custkey")
        c.join(open, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey""")),

    // ---- J3: semi-join -------------------------------------------------
    Q("q17_suppliers_with_bulk_lines",
      (s, dir) => {
        import s.implicits._
        val sup = t(s, dir, "supplier")
        val bulk = t(s, dir, "lineitem").filter($"l_quantity" >= 49.0)
          .select($"l_suppkey")
        sup.join(bulk, $"s_suppkey" === $"l_suppkey", "left_semi")
          .select($"s_suppkey", $"s_name")
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity >= 49.0)
        ORDER BY s_suppkey""")),

    // ---- HAVING over group ---------------------------------------------
    Q("q18_frequent_customers",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("total_spend"))
          .filter($"n_orders" >= 18)
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey, count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey HAVING count(*) >= 18
        ORDER BY o_custkey""")),

    // ---- ROLLUP (grouping sets family; A3 neighborhood) ----------------
    Q("q19_rollup_status_priority",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ---- F5/F6: JSON extraction from string props (README.md:115-116) --
    Q("q20_events_json_extract",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"k").as("sum_k"),
            dsum($"value").as("sum_value"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- F7/F8: time bucketing (README.md:117 date arithmetic) ---------
    Q("q21_events_daily",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"),
            $"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
          .orderBy($"day", $"event_type")
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY day, event_type""")),

    // ---- INTERSECT / EXCEPT (set ops, §2.4) ----------------------------
    Q("q22_intersect_customers",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        o.filter($"o_orderstatus" === "F").select($"o_custkey")
          .intersect(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY o_custkey""")),

    Q("q23_except_customers",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        o.select($"o_custkey")
          .except(o.filter($"o_orderstatus" === "P").select($"o_custkey"))
          .orderBy($"o_custkey")
      },
      Some("""SELECT DISTINCT o_custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        ORDER BY o_custkey""")),

    // ---- pivot (dbt_utils pivot analogue) ------------------------------
    Q("q24_pivot_status_counts",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").groupBy($"o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("F", "O", "P"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
        count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- F1-F9 scalar function showcase --------------------------------
    Q("q25_scalar_functions",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part").filter($"p_partkey" < 500)
          .select(
            $"p_partkey",
            upper($"p_name").as("name_upper"),
            regexp_replace($"p_type", lit(" "), lit("_")).as("type_us"),
            concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
            substring($"p_name", 1, 5).as("name5"),
            length($"p_name").cast(LongType).as("name_len"),
            trim(lower($"p_brand")).as("brand_lc"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey, upper(p_name) AS name_upper,
        replace(p_type, ' ', '_') AS type_us,
        p_brand || ':' || p_type AS brand_type,
        substring(p_name, 1, 5) AS name5,
        CAST(length(p_name) AS BIGINT) AS name_len,
        trim(lower(p_brand)) AS brand_lc
        FROM part WHERE p_partkey < 500 ORDER BY p_partkey""")),

    // ---- GROUP BY ALL (A3; README.md:118) ------------------------------
    Q("q26_group_by_all",
      (s, dir) => {
        s.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders_gba")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
                 FROM orders_gba GROUP BY ALL
                 ORDER BY o_orderstatus, o_orderpriority""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders GROUP BY ALL ORDER BY o_orderstatus, o_orderpriority""")),

    // ---- correlated scalar subquery ------------------------------------
    Q("q27_orders_above_customer_avg",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val avgSpend = o.groupBy($"o_custkey".as("k"))
          .agg((sum(dec($"o_totalprice")).cast(DoubleType) / count(lit(1))).as("avg_spend"))
        o.join(avgSpend, $"o_custkey" === $"k")
          .filter($"o_totalprice" > $"avg_spend" * 1.8)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        JOIN (SELECT o_custkey AS k,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_spend
              FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.k
        WHERE o_totalprice > avg_spend * 1.8 ORDER BY o_orderkey""")),

    // ---- date spine (dbt_utils.date_spine): sequence + explode, left
    //      join so gap days survive with zero counts ---------------------
    Q("q28_date_spine",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders").select(to_date($"o_orderdate").as("day"))
        val spine = o.agg(min($"day").as("lo"), max($"day").as("hi"))
          .select(explode(sequence($"lo", $"hi", expr("interval 1 day"))).as("day"))
        val daily = o.groupBy($"day").agg(count(lit(1)).as("n"))
        spine.join(daily, Seq("day"), "left")
          .select(date_format($"day", "yyyy-MM-dd").as("day"),
            coalesce($"n", lit(0L)).as("n_orders"))
          .orderBy($"day")
      },
      Some("""WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        d AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders GROUP BY 1)
        SELECT strftime(spine.day, '%Y-%m-%d') AS day, coalesce(d.n, 0) AS n_orders
        FROM spine LEFT JOIN d ON spine.day = d.day ORDER BY day""")),

    // ---- surrogate key (dbt_utils.generate_surrogate_key): md5 over
    //      null-coalesced stringified columns -----------------------------
    Q("q29_surrogate_key",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").filter($"o_orderkey" < 2000)
          .select($"o_orderkey",
            md5(concat_ws("-",
              coalesce($"o_custkey".cast("string"), lit("_null_")),
              coalesce($"o_orderstatus", lit("_null_")),
              coalesce($"o_orderpriority", lit("_null_")))).as("sk"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        md5(concat_ws('-',
          coalesce(CAST(o_custkey AS VARCHAR), '_null_'),
          coalesce(o_orderstatus, '_null_'),
          coalesce(o_orderpriority, '_null_'))) AS sk
        FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""")),

    // ---- correlated min subquery (TPC-H Q2 shape): cheapest supplier
    //      per part among its suppliers' nation peers ---------------------
    Q("q31_cheapest_open_order",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
        val minPerCust = o.groupBy($"o_custkey".as("mk"))
          .agg(min($"o_totalprice").as("min_price"))
        o.join(minPerCust, $"o_custkey" === $"mk" &&
            $"o_totalprice" === $"min_price")
          .select($"o_custkey", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM orders o
        WHERE o_totalprice = (SELECT min(o_totalprice) FROM orders i
                              WHERE i.o_custkey = o.o_custkey)
        ORDER BY o_custkey, o_orderkey""")),

    // ---- IN-subquery over grouped HAVING (TPC-H Q18 shape) -------------
    Q("q32_large_volume_orders",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        val big = li.groupBy($"l_orderkey")
          .agg(dsum($"l_quantity").as("total_qty"))
          .filter($"total_qty" > 250.0)
        o.join(big, $"o_orderkey" === $"l_orderkey")
          .select($"o_orderkey", $"o_custkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"),
            $"total_qty")
          .orderBy($"total_qty".desc, $"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
        strftime(o_orderdate, '%Y-%m-%d') AS orderdate, total_qty
        FROM orders JOIN (
          SELECT l_orderkey,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY l_orderkey HAVING total_qty > 250.0) b
        ON o_orderkey = b.l_orderkey
        ORDER BY total_qty DESC, o_orderkey""")),

    // ---- F7/F8 widened: the date/time function surface (trunc, offsets,
    //      ISO week/dow, month arithmetic with end-of-month clamping) -----
    Q("q33_datetime_functions",
      (s, dir) => {
        import s.implicits._
        val d = to_date($"o_orderdate")
        t(s, dir, "orders").filter($"o_orderkey" < 400)
          .select(
            $"o_orderkey",
            date_format(d, "yyyy-MM-dd").as("d"),
            year(d).cast(LongType).as("yr"),
            quarter(d).cast(LongType).as("qtr"),
            month(d).cast(LongType).as("mo"),
            weekofyear(d).cast(LongType).as("iso_week"),
            (((dayofweek(d) + 5) % 7) + 1).cast(LongType).as("iso_dow"),
            date_format(add_months(d, 3), "yyyy-MM-dd").as("plus3mo"),
            date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
            datediff(d, lit("1995-01-01").cast("date")).cast(LongType)
              .as("days_since"),
            date_format(date_trunc("month", d), "yyyy-MM-dd").as("month_start"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        CAST(month(o_orderdate) AS BIGINT) AS mo,
        CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
        strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start
        FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey""")),

    // ---- F1-F4 widened: split_part/pad/instr/left/right/reverse/repeat/
    //      translate + NULL handling (nullif/ifnull/greatest/least) -------
    Q("q34_string_null_functions",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part").filter($"p_partkey" < 300)
          .select(
            $"p_partkey",
            expr("split_part(p_type, ' ', 2)").as("type_word2"),
            lpad($"p_partkey".cast("string"), 8, "0").as("key_padded"),
            instr($"p_name", "a").cast(LongType).as("first_a"),
            expr("left(p_name, 4)").as("name_l4"),
            expr("right(p_name, 3)").as("name_r3"),
            reverse($"p_brand").as("brand_rev"),
            repeat($"p_brand", 2).as("brand_twice"),
            translate($"p_name", "ae", "AE").as("name_tr"),
            nullif($"p_size", lit(10)).cast(LongType).as("size_not10"),
            coalesce(nullif($"p_size", lit(10)), lit(-1)).cast(LongType)
              .as("size_or_neg1"),
            greatest($"p_size", lit(25)).cast(LongType).as("size_hi"),
            least($"p_size", lit(25)).cast(LongType).as("size_lo"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
        split_part(p_type, ' ', 2) AS type_word2,
        lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
        left(p_name, 4) AS name_l4,
        right(p_name, 3) AS name_r3,
        reverse(p_brand) AS brand_rev,
        repeat(p_brand, 2) AS brand_twice,
        translate(p_name, 'ae', 'AE') AS name_tr,
        CAST(nullif(p_size, 10) AS BIGINT) AS size_not10,
        CAST(ifnull(nullif(p_size, 10), -1) AS BIGINT) AS size_or_neg1,
        CAST(greatest(p_size, 25) AS BIGINT) AS size_hi,
        CAST(least(p_size, 25) AS BIGINT) AS size_lo
        FROM part WHERE p_partkey < 300 ORDER BY p_partkey""")),

    // ---- listagg / array_agg (Snowflake LISTAGG, dbt_utils.listagg):
    //      order-independent via sort before join --------------------------
    Q("q35_listagg_priorities",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").groupBy($"o_orderstatus")
          .agg(
            concat_ws(",", sort_array(collect_set($"o_orderpriority")))
              .as("prios"),
            count(lit(1)).as("n"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
        array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS prios,
        count(*) AS n FROM orders GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // ---- explode / unnest (lateral table function family) ---------------
    Q("q36_explode_type_words",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part").filter($"p_partkey" < 100)
          .select($"p_partkey", explode(split($"p_type", " ")).as("word"))
          .orderBy($"p_partkey", $"word")
      },
      Some("""SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
        FROM part WHERE p_partkey < 100 ORDER BY p_partkey, word""")),

    // ---- VariantType: NESTED object + array-index navigation. The JSON
    //      is constructed Spark-side (to_json of a struct) and re-parsed;
    //      the oracle asserts the $.id / $.tags[1] paths recover the
    //      source columns bit-exactly ------------------------------------
    Q("q37_variant_nested",
      (s, dir) => {
        import s.implicits._
        val j = to_json(struct($"o_custkey".as("id"),
          array($"o_orderstatus", $"o_orderpriority").as("tags")))
        t(s, dir, "orders").filter($"o_orderkey" < 1000)
          .withColumn("v", parse_json(j))
          .select($"o_orderkey",
            variant_get($"v", "$.id", "bigint").as("cust_id"),
            variant_get($"v", "$.tags[1]", "string").as("prio"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey AS cust_id, o_orderpriority AS prio
        FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""")),

    // ---- GROUPING SETS + grouping() flags (beyond q19's ROLLUP) --------
    Q("q38_grouping_sets",
      (s, dir) => {
        s.read.parquet(s"$dir/orders.parquet")
          .createOrReplaceTempView("orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
          CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
          count(*) AS n
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
            o_orderpriority NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
          o_orderpriority NULLS FIRST""")),

    // ---- UNPIVOT / melt (wide -> long; §2.4 neighborhood) --------------
    Q("q39_unpivot_metrics",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders").filter($"o_orderkey" < 200)
          .select($"o_orderkey",
            $"o_totalprice".cast(DoubleType).as("totalprice"),
            $"o_custkey".cast(DoubleType).as("custkey"))
          .unpivot(Array($"o_orderkey"), Array($"totalprice", $"custkey"),
            "metric", "value")
          .orderBy($"o_orderkey", $"metric")
      },
      Some("""SELECT o_orderkey, metric, value FROM (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
          CAST(o_custkey AS DOUBLE) AS custkey FROM orders WHERE o_orderkey < 200)
        UNPIVOT (value FOR metric IN (totalprice, custkey))
        ORDER BY o_orderkey, metric""")),

    // ---- exact percentiles (interpolated; the exact twin of q30's HLL
    //      posture — Spark `percentile` == DuckDB `quantile_cont`) --------
    Q("q40_percentiles",
      (s, dir) => {
        import s.implicits._
        val price = $"o_totalprice".cast(DoubleType)
        t(s, dir, "orders").groupBy($"o_orderstatus")
          .agg(
            round(percentile(price, lit(0.5)), 4).as("p50"),
            round(percentile(price, lit(0.9)), 4).as("p90"),
            round(percentile(price, lit(0.99)), 4).as("p99"))
          .orderBy($"o_orderstatus")
      },
      Some("""SELECT o_orderstatus,
        round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 4) AS p50,
        round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 4) AS p90,
        round(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99), 4) AS p99
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- statistical aggregates (stddev/var/corr/covar) ----------------
    Q("q41_stats_aggregates",
      (s, dir) => {
        import s.implicits._
        val qty = $"l_quantity".cast(DoubleType)
        t(s, dir, "lineitem").groupBy($"l_returnflag")
          .agg(
            round(stddev_samp(qty), 4).as("sd_qty"),
            round(var_samp($"l_discount".cast(DoubleType)), 6).as("var_disc"),
            round(corr(qty, $"l_extendedprice".cast(DoubleType)), 4).as("corr_qp"),
            round(covar_samp(qty, $"l_tax".cast(DoubleType)), 6).as("cov_qt"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
        round(stddev_samp(CAST(l_quantity AS DOUBLE)), 4) AS sd_qty,
        round(var_samp(CAST(l_discount AS DOUBLE)), 6) AS var_disc,
        round(corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 4) AS corr_qp,
        round(covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_tax AS DOUBLE)), 6) AS cov_qt
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- window navigation: lead/lag/first_value/ntile -----------------
    Q("q42_window_navigation",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders").filter($"o_custkey" < 50)
          .select($"o_custkey", $"o_orderkey",
            lead($"o_orderkey", 1).over(w).as("next_ok"),
            lag($"o_orderkey", 1).over(w).as("prev_ok"),
            first($"o_orderkey").over(w).as("first_ok"),
            ntile(4).over(w).cast(LongType).as("quartile"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        lead(o_orderkey) OVER w AS next_ok,
        lag(o_orderkey) OVER w AS prev_ok,
        first_value(o_orderkey) OVER w AS first_ok,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM orders WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")),

    // ---- HLL approximate distinct (the 100 TB COUNT(DISTINCT) posture).
    //      The sketch estimate is engine-specific, so the query
    //      adjudicates ITSELF: it emits the exact count plus a
    //      within-5%-relative-error verdict, and the oracle asserts the
    //      verdict is true for every group — a hash mismatch IS a failed
    //      error bound, so the driver carries an explicit pass/fail
    //      instead of a weaker no_oracle row. (CoreQueriesSpec asserts
    //      the same bound against the raw estimate.) ----------------------
    Q("q30_approx_distinct",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(approx_count_distinct($"l_partkey").as("approx"),
            countDistinct($"l_partkey").as("exact_parts"),
            count(lit(1)).as("n_rows"))
          .select($"l_returnflag", $"exact_parts", $"n_rows",
            (abs($"approx" - $"exact_parts").cast(DoubleType) / $"exact_parts"
              <= 0.05).as("within_bound"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        count(*) AS n_rows, true AS within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
