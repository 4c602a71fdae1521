package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational query surface: scans, filters, aggregations, joins,
  * windows, set ops, sorts/top-k, scalar functions, subqueries.
  *
  * The reference (Apache Paimon) delegates all of these to the host
  * engine (SURVEY.md §2.3–2.8); here they are first-class Spark
  * DataFrame plans so the rebuilt engine covers the same end-to-end
  * query surface. Every query is paired with an ANSI-SQL oracle.
  */
object Relational {

  val defs: Vector[QDef] = Vector(
    // ---- scan + aggregate (TPC-H Q1 shape): map-side partial agg,
    // filter pushed to parquet, 6-col ReadSchema out of 11.
    QDef(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
          asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("sum_disc_price"),
          asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))).as("sum_charge"),
          count(lit(1)).as("count_order"))
    },

    // ---- projection + filter pushdown: 2 of 11 columns reach the scan.
    QDef(
      "q02_filter_projection",
      """SELECT l_orderkey, l_linenumber, CAST(ROUND(l_quantity, 2) AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), asDouble(col("l_quantity")).as("qty"))
    },

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape).
    QDef(
      "q03_shipping_priority",
      """SELECT l_orderkey,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val c = gtbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = gtbl(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      val l = gtbl(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-03-15 00:00:00").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- semi join (EXISTS).
    QDef(
      "q04_order_priority_exists",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = gtbl(s, dir, "orders")
      val l = gtbl(s, dir, "lineitem").filter(col("l_quantity") > 45)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // ---- 6-way join (TPC-H Q5 shape): dims broadcast, facts shuffled.
    QDef(
      "q05_local_supplier_volume",
      """SELECT n_name,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      val c = gtbl(s, dir, "customer")
      val o = gtbl(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val l = gtbl(s, dir, "lineitem")
      val su = gtbl(s, dir, "supplier")
      val n = gtbl(s, dir, "nation")
      val r = gtbl(s, dir, "region").filter(col("r_name") === "ASIA")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(asDouble(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))).as("revenue"))
    },

    // ---- pure scan-agg with range predicates (TPC-H Q6 shape).
    QDef(
      "q06_forecast_revenue",
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          asDouble(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"),
          count(lit(1)).as("n"))
    },

    // ---- anti join (NOT EXISTS).
    QDef(
      "q07_customers_without_orders",
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "customer")
        .join(
          gtbl(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"))
    },

    // ---- window: top-N per group.
    QDef(
      "q08_top_orders_per_customer",
      """SELECT o_custkey, o_orderkey, CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      gtbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          asDouble(col("o_totalprice")).as("totalprice"), col("rn"))
    },

    // ---- window: running aggregate (frame ROWS UNBOUNDED PRECEDING).
    QDef(
      "q09_running_customer_spend",
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      gtbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          asDouble(sum(dec(col("o_totalprice"))).over(w)).as("running_spend"))
    },

    // ---- window: lag/lead.
    QDef(
      "q10_order_gap_days",
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) AS BIGINT) AS gap_days
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      gtbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"),
            lag(col("o_orderdate"), 1).over(w).cast("date")).cast("long").as("gap_days"))
    },

    // ---- global top-k with deterministic tiebreak.
    QDef(
      "q11_topk_lineitems",
      """SELECT l_orderkey, l_linenumber, CAST(ROUND(l_extendedprice, 2) AS DOUBLE) AS price
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 25""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
          asDouble(col("l_extendedprice")).as("price"))
        .limit(25)
    },

    // ---- distinct aggregation.
    QDef(
      "q12_distinct_parts_per_flag",
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    },

    // ---- set operations: UNION / INTERSECT / EXCEPT.
    QDef(
      "q13_set_ops_nations",
      """SELECT 'both' AS op, k FROM
        |  (SELECT DISTINCT c_nationkey AS k FROM customer
        |   INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS op, k FROM
        |  (SELECT DISTINCT c_nationkey AS k FROM customer
        |   EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'supp_only' AS op, k FROM
        |  (SELECT DISTINCT s_nationkey AS k FROM supplier
        |   EXCEPT SELECT DISTINCT c_nationkey FROM customer)""".stripMargin) { (s, dir) =>
      val c = gtbl(s, dir, "customer").select(col("c_nationkey").as("k")).distinct()
      val su = gtbl(s, dir, "supplier").select(col("s_nationkey").as("k")).distinct()
      c.intersect(su).select(lit("both").as("op"), col("k"))
        .unionAll(c.except(su).select(lit("cust_only").as("op"), col("k")))
        .unionAll(su.except(c).select(lit("supp_only").as("op"), col("k")))
    },

    // ---- ROLLUP.
    QDef(
      "q14_rollup_flag_status",
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("l_quantity")))).as("qty"))
    },

    // ---- CUBE.
    QDef(
      "q15_cube_status_priority",
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("o_totalprice")))).as("total"))
    },

    // ---- GROUPING SETS (SQL path through our engine).
    QDef(
      "q16_grouping_sets",
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem").createOrReplaceTempView("graft_q16_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
          |FROM graft_q16_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },

    // ---- scalar string functions.
    QDef(
      "q17_string_functions",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  concat(p_brand, ':', p_type) AS brand_type,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  replace(p_type, ' ', '_') AS type_u
        |FROM part WHERE p_name LIKE '%gear%'""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "part")
        .filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_type"), " ", "_").as("type_u"))
    },

    // ---- scalar date/time functions.
    QDef(
      "q18_datetime_functions",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"), asDouble(sum(dec(col("o_totalprice")))).as("total"))
    },

    // ---- conditional aggregation (CASE WHEN pivot).
    QDef(
      "q19_conditional_agg",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big,
        |  CAST(SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS small,
        |  CAST(ROUND(SUM(CASE WHEN l_discount > 0.05 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE) AS discounted_rev
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("big"),
          sum(when(col("l_quantity") <= 25, 1L).otherwise(0L)).as("small"),
          asDouble(sum(when(col("l_discount") > 0.05, dec(col("l_extendedprice")))
            .otherwise(dec(lit(0))))).as("discounted_rev"))
    },

    // ---- scalar subquery (orders above global average price).
    QDef(
      "q20_above_avg_orders",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = gtbl(s, dir, "orders")
      val avgDf = o.agg(avg(col("o_totalprice")).as("ap"))
      o.crossJoin(broadcast(avgDf))
        .filter(col("o_totalprice") > col("ap"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
    },

    // ---- IN-subquery over an aggregated set (semi join on HAVING).
    QDef(
      "q21_big_spender_segments",
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders GROUP BY o_custkey
        |   HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 400000.00)
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val spenders = gtbl(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(dec(col("o_totalprice"))).as("spend"))
        .filter(col("spend") > 400000.00)
      gtbl(s, dir, "customer")
        .join(spenders, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
    },

    // ---- full outer join with coalesce (join variety).
    QDef(
      "q22_full_outer_nation_activity",
      """SELECT COALESCE(ck, sk) AS nationkey,
        |  CAST(COALESCE(nc, 0) AS BIGINT) AS n_customers,
        |  CAST(COALESCE(ns, 0) AS BIGINT) AS n_suppliers
        |FROM (SELECT c_nationkey AS ck, COUNT(*) AS nc FROM customer GROUP BY 1) a
        |FULL OUTER JOIN
        |  (SELECT s_nationkey AS sk, COUNT(*) AS ns FROM supplier GROUP BY 1) b
        |ON a.ck = b.sk""".stripMargin) { (s, dir) =>
      val a = gtbl(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("nc"))
      val b = gtbl(s, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("ns"))
      a.join(b, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("nc"), lit(0L)).as("n_customers"),
          coalesce(col("ns"), lit(0L)).as("n_suppliers"))
    },

    // ---- theta/range join predicate (equi key + time range).
    QDef(
      "q23_shipped_within_30d",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "lineitem")
        .join(gtbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
    },

    // ---- multi-way aggregate over a star join with date bucketing.
    QDef(
      "q24_monthly_nation_revenue",
      """SELECT n_name, date_trunc('month', o_orderdate) AS month,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name, date_trunc('month', o_orderdate)""".stripMargin) { (s, dir) =>
      gtbl(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(gtbl(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(gtbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
        .agg(asDouble(sum(dec(col("o_totalprice")))).as("revenue"))
    })
}
