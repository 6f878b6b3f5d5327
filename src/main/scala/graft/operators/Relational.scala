package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** The relational harness surface (SURVEY.md §2.2–§2.8): scans with
  * pushdown, equi/semi/anti/broadcast joins, hash aggregation with
  * partial+final handled by Catalyst, window functions, top-k
  * (TakeOrderedAndProject), set ops, string/date/JSON/math scalar
  * functions, rollup.
  *
  * Scale notes (100 TB design stance):
  *  - fact-fact joins (`lineitem ⋈ orders`) shuffle on the join key and
  *    rely on AQE for skew; dimension joins (`nation`, `region`) are
  *    explicitly `broadcast()` so they never shuffle the fact side;
  *  - every aggregate is expressed on built-in functions so map-side
  *    partial aggregation and whole-stage codegen apply;
  *  - all top-k queries are `orderBy(...).limit(k)` which Catalyst plans
  *    as TakeOrderedAndProject (per-partition heap + driver merge, no
  *    global sort);
  *  - filters/projections sit directly on the scan so they reach parquet
  *    (`PushedFilters`, pruned `ReadSchema`).
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- q01
    // TPC-H Q1-shaped pricing summary: filter → groupBy → 5 aggregates.
    QueryDef(
      "q01_pricing_summary",
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.trim),
      (s, d) => {
        import s.implicits._
        lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
            davg($"l_quantity").as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      }),

    // ---------------------------------------------------------------- q02
    // Pushdown probe: selective filter + narrow projection; the plan must
    // show PushedFilters on shipdate/discount/quantity and a 3-column
    // ReadSchema.
    QueryDef(
      "q02_filter_pushdown",
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS disc_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        ORDER BY l_orderkey, l_linenumber
      """.trim),
      (s, d) => {
        import s.implicits._
        lineitem(s, d)
          .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
            $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
          .select($"l_orderkey", $"l_linenumber",
            ($"l_extendedprice" * $"l_discount").as("disc_revenue"))
          .orderBy($"l_orderkey", $"l_linenumber")
      }),

    // ---------------------------------------------------------------- q03
    // TPC-H Q3-shaped: 3-way join, revenue agg, top-10. customer filter is
    // applied before the join so the build side is small.
    QueryDef(
      "q03_top_orders_by_revenue",
      Some("""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
      """.trim),
      (s, d) => {
        import s.implicits._
        customer(s, d).filter($"c_mktsegment" === "BUILDING")
          .join(orders(s, d), $"c_custkey" === $"o_custkey")
          .join(lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderkey", $"o_orderdate")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
          .select($"o_orderkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"), $"revenue")
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(10)
      }),

    // ---------------------------------------------------------------- q04
    // Semi join (EXISTS): orders with any heavy lineitem.
    QueryDef(
      "q04_semi_join_orders",
      Some(s"""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               ${sqlSum("o_totalprice")} AS total_price
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.trim),
      (s, d) => {
        import s.implicits._
        orders(s, d)
          .join(lineitem(s, d).filter($"l_quantity" > 45),
            $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total_price"))
          .orderBy($"o_orderpriority")
      }),

    // ---------------------------------------------------------------- q05
    // Anti join (NOT EXISTS): customers that never ordered, per nation.
    QueryDef(
      "q05_anti_join_customers",
      Some(s"""
        SELECT n_name, COUNT(*) AS n_customers,
               ${sqlSum("c_acctbal")} AS acctbal_sum
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        GROUP BY n_name
        ORDER BY n_name
      """.trim),
      (s, d) => {
        import s.implicits._
        customer(s, d)
          .join(orders(s, d).filter($"o_totalprice" > 300000),
            $"c_custkey" === $"o_custkey", "left_anti")
          .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("acctbal_sum"))
          .orderBy($"n_name")
      }),

    // ---------------------------------------------------------------- q06
    // Broadcast dimension chain: customer → nation → region rollup. Both
    // dims are broadcast — the customer side never shuffles for the join.
    QueryDef(
      "q06_region_acctbal",
      Some(s"""
        SELECT r_name, COUNT(*) AS n_customers,
               ${sqlSum("c_acctbal")} AS total_acctbal,
               ${sqlAvg("c_acctbal")} AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
      """.trim),
      (s, d) => {
        import s.implicits._
        customer(s, d)
          .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(region(s, d)), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_customers"),
            dsum($"c_acctbal").as("total_acctbal"),
            davg($"c_acctbal").as("avg_acctbal"))
          .orderBy($"r_name")
      }),

    // ---------------------------------------------------------------- q07
    // Ranking window: top-3 orders per customer (deterministic tiebreak on
    // orderkey — required for distributed == single-node parity).
    QueryDef(
      "q07_topk_per_customer",
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
        WHERE rk <= 3
        ORDER BY o_custkey, rk
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        orders(s, d)
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk".cast("long").as("rk"))
          .orderBy($"o_custkey", $"rk")
      }),

    // ---------------------------------------------------------------- q08
    // Analytic windows: running sum (exact via decimal) + lag/lead per user.
    QueryDef(
      "q08_running_window_events",
      Some("""
        SELECT event_id, user_id, value,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                 PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
               LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
               LEAD(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_event_id
        FROM events
        ORDER BY event_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
        events(s, d)
          .withColumn("running_value",
            sum($"value".cast(DecimalType(18, 2)))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double"))
          .withColumn("prev_value", lag($"value", 1).over(w))
          .withColumn("next_event_id", lead($"event_id", 1).over(w))
          .select($"event_id", $"user_id", $"value", $"running_value",
            $"prev_value", $"next_event_id")
          .orderBy($"event_id")
      }),

    // ---------------------------------------------------------------- q09
    // Global top-k → TakeOrderedAndProject (heap per partition, no sort).
    QueryDef(
      "q09_top_events_by_value",
      Some("""
        SELECT event_id, user_id, event_type, value
        FROM events
        ORDER BY value DESC, event_id
        LIMIT 100
      """.trim),
      (s, d) => {
        import s.implicits._
        events(s, d)
          .select($"event_id", $"user_id", $"event_type", $"value")
          .orderBy(desc("value"), asc("event_id"))
          .limit(100)
      }),

    // ---------------------------------------------------------------- q10
    // Set operations: EXCEPT / INTERSECT / UNION over nation keys.
    QueryDef(
      "q10_set_ops_nations",
      Some("""
        SELECT nationkey, 'both' AS op FROM (
          SELECT DISTINCT c_nationkey AS nationkey FROM customer
          INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'cust_only' AS op FROM (
          SELECT DISTINCT c_nationkey AS nationkey FROM customer
          EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        UNION ALL
        SELECT nationkey, 'supp_only' AS op FROM (
          SELECT DISTINCT s_nationkey AS nationkey FROM supplier
          EXCEPT SELECT DISTINCT c_nationkey FROM customer)
        ORDER BY op, nationkey
      """.trim),
      (s, d) => {
        import s.implicits._
        val cust = customer(s, d).select($"c_nationkey".as("nationkey")).distinct()
        val supp = supplier(s, d).select($"s_nationkey".as("nationkey")).distinct()
        cust.intersect(supp).withColumn("op", lit("both"))
          .union(cust.except(supp).withColumn("op", lit("cust_only")))
          .union(supp.except(cust).withColumn("op", lit("supp_only")))
          .orderBy($"op", $"nationkey")
      }),

    // ---------------------------------------------------------------- q11
    // Distinct aggregation (exact; approx_count_distinct is exercised in
    // the bench set, not the oracle set — sketches aren't comparable).
    QueryDef(
      "q11_distinct_agg",
      Some(s"""
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS n_cust,
               COUNT(*) AS n_orders,
               ${sqlSum("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.trim),
      (s, d) => {
        import s.implicits._
        orders(s, d)
          .groupBy($"o_orderpriority")
          .agg(countDistinct($"o_custkey").as("n_cust"),
            count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("sum_price"))
          .orderBy($"o_orderpriority")
      }),

    // ---------------------------------------------------------------- q12
    // String scalar functions (F1-family): lower/regexp/split/substring/
    // length/concat_ws — all codegen'd built-ins, no UDFs.
    QueryDef(
      "q12_string_funcs",
      Some("""
        SELECT p_partkey,
               lower(p_name) AS lname,
               regexp_replace(lower(p_name), '[^a-z0-9 ]', '', 'g') AS clean,
               CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
               substring(p_type, 1, 5) AS type_prefix,
               CAST(length(p_name) AS BIGINT) AS name_len,
               concat_ws('|', p_brand, p_type) AS brand_type
        FROM part
        ORDER BY p_partkey
      """.trim),
      (s, d) => {
        import s.implicits._
        part(s, d).select(
          $"p_partkey",
          lower($"p_name").as("lname"),
          regexp_replace(lower($"p_name"), "[^a-z0-9 ]", "").as("clean"),
          size(split($"p_name", " ")).cast("long").as("n_tokens"),
          substring($"p_type", 1, 5).as("type_prefix"),
          length($"p_name").cast("long").as("name_len"),
          concat_ws("|", $"p_brand", $"p_type").as("brand_type"))
          .orderBy($"p_partkey")
      }),

    // ---------------------------------------------------------------- q13
    // Date functions: month bucketing + min/max formatting.
    QueryDef(
      "q13_orders_by_month",
      Some(s"""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               COUNT(*) AS n_orders,
               ${sqlSum("o_totalprice")} AS sum_price,
               strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
               strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order
        FROM orders
        GROUP BY 1
        ORDER BY 1
      """.trim),
      (s, d) => {
        import s.implicits._
        orders(s, d)
          .groupBy(date_format($"o_orderdate", "yyyy-MM").as("order_month"))
          .agg(count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("sum_price"),
            date_format(min($"o_orderdate"), "yyyy-MM-dd").as("first_order"),
            date_format(max($"o_orderdate"), "yyyy-MM-dd").as("last_order"))
          .orderBy($"order_month")
      }),

    // ---------------------------------------------------------------- q14
    // Semi-structured JSON extraction (reference utils.py:134-163 parses
    // JSON out of text; here over the events.props JSON column).
    QueryDef(
      "q14_json_extract_events",
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        events(s, d)
          .withColumn("k", get_json_object($"props", "$.k").cast("long"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"k").as("k_sum"),
            min($"k").as("k_min"), max($"k").as("k_max"))
          .orderBy($"event_type")
      }),

    // ---------------------------------------------------------------- q15
    // CASE + math scalar functions (per-row double math is IEEE-deterministic).
    QueryDef(
      "q15_case_math",
      Some("""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity > 30 THEN 'high'
                    WHEN l_quantity > 10 THEN 'mid'
                    ELSE 'low' END AS qty_band,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
               CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
               sqrt(l_extendedprice) AS price_sqrt,
               l_extendedprice * l_tax AS tax_amt
        FROM lineitem
        WHERE l_orderkey % 100 = 0
        ORDER BY l_orderkey, l_linenumber
      """.trim),
      (s, d) => {
        import s.implicits._
        lineitem(s, d)
          .filter($"l_orderkey" % 100 === 0)
          .select($"l_orderkey", $"l_linenumber",
            when($"l_quantity" > 30, "high")
              .when($"l_quantity" > 10, "mid").otherwise("low").as("qty_band"),
            abs($"l_discount" - 0.05).as("disc_dev"),
            ceil($"l_quantity" / 7.0).cast("long").as("qty_ceil"),
            floor($"l_extendedprice" / 1000.0).cast("long").as("price_k"),
            sqrt($"l_extendedprice").as("price_sqrt"),
            ($"l_extendedprice" * $"l_tax").as("tax_amt"))
          .orderBy($"l_orderkey", $"l_linenumber")
      }),

    // ---------------------------------------------------------------- q16
    // Rollup (hierarchical aggregation); nulls coalesced away so ordering
    // semantics match across engines.
    QueryDef(
      "q16_rollup_lineitem",
      Some(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS n, ${sqlSum("l_quantity")} AS qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY rf, ls
      """.trim),
      (s, d) => {
        import s.implicits._
        lineitem(s, d)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("qty"))
          .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
            coalesce($"l_linestatus", lit("ALL")).as("ls"), $"n", $"qty")
          .orderBy($"rf", $"ls")
      })
  )
}
