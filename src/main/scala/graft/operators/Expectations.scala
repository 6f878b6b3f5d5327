package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectation-suite data-quality gate (the Great-Expectations /
  * deequ shape): a named rule catalog over five tables, evaluated as
  * ONE conditional-aggregate scan per table — each table contributes
  * all its rule counters from a single pass (map-side combined to one
  * row), and the per-rule rows are exploded from that row, never by
  * re-scanning the table per rule. The one join-backed rule
  * (lineitem→orders referential integrity) is an anti-join count —
  * the dq_integrity shape. The supplier balance rule FAILS on the
  * synthetic data (6 negative balances) by design: a gate that cannot
  * fire proves nothing.
  */
object Expectations {

  private def tableRules(table: String, df: DataFrame,
      rules: Seq[(String, Column)]): DataFrame = {
    val agg = df.agg(count(lit(1)).as("n_rows"),
      rules.map { case (nm, bad) =>
        sum(when(bad, 1).otherwise(0)).as(nm) }: _*)
    agg.select(lit(table).as("table_name"), col("n_rows"),
      explode(map(rules.flatMap { case (nm, _) =>
        Seq(lit(nm), col(nm).cast("long")) }: _*)).as(Seq("rule", "n_violations")))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "dq_expectations",
      Some("""
        WITH o AS (
          SELECT COUNT(*) AS n,
                 SUM(CASE WHEN NOT (o_totalprice > 0.0) THEN 1 ELSE 0 END) AS totalprice_positive,
                 SUM(CASE WHEN NOT (o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '2002-01-01') THEN 1 ELSE 0 END) AS orderdate_in_range,
                 SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS status_in_set
          FROM orders),
        l AS (
          SELECT COUNT(*) AS n,
                 SUM(CASE WHEN NOT (l_quantity >= 1.0 AND l_quantity <= 50.0) THEN 1 ELSE 0 END) AS quantity_in_range,
                 SUM(CASE WHEN NOT (l_discount >= 0.0 AND l_discount <= 0.2) THEN 1 ELSE 0 END) AS discount_in_range
          FROM lineitem),
        lr AS (
          SELECT (SELECT COUNT(*) FROM lineitem) AS n,
                 COUNT(*) AS orderkey_in_orders
          FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        c AS (
          SELECT COUNT(*) AS n,
                 SUM(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE', 'HOUSEHOLD', 'BUILDING', 'FURNITURE', 'MACHINERY') THEN 1 ELSE 0 END) AS mktsegment_in_set,
                 SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS acctbal_not_null
          FROM customer),
        e AS (
          SELECT COUNT(*) AS n,
                 SUM(CASE WHEN NOT (value > 0.0) THEN 1 ELSE 0 END) AS value_positive,
                 SUM(CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END) AS event_type_in_set
          FROM events),
        d AS (
          SELECT COUNT(*) AS n,
                 SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS n_chars_consistent,
                 SUM(CASE WHEN text = '' OR text IS NULL THEN 1 ELSE 0 END) AS text_not_empty
          FROM documents),
        s AS (
          SELECT COUNT(*) AS n,
                 SUM(CASE WHEN s_acctbal < 0.0 THEN 1 ELSE 0 END) AS acctbal_nonnegative
          FROM supplier),
        rows_out(table_name, n_rows, rule, n_violations) AS (
          SELECT 'orders', n, 'totalprice_positive', totalprice_positive FROM o
          UNION ALL SELECT 'orders', n, 'orderdate_in_range', orderdate_in_range FROM o
          UNION ALL SELECT 'orders', n, 'status_in_set', status_in_set FROM o
          UNION ALL SELECT 'lineitem', n, 'quantity_in_range', quantity_in_range FROM l
          UNION ALL SELECT 'lineitem', n, 'discount_in_range', discount_in_range FROM l
          UNION ALL SELECT 'lineitem', n, 'orderkey_in_orders', orderkey_in_orders FROM lr
          UNION ALL SELECT 'customer', n, 'mktsegment_in_set', mktsegment_in_set FROM c
          UNION ALL SELECT 'customer', n, 'acctbal_not_null', acctbal_not_null FROM c
          UNION ALL SELECT 'events', n, 'value_positive', value_positive FROM e
          UNION ALL SELECT 'events', n, 'event_type_in_set', event_type_in_set FROM e
          UNION ALL SELECT 'documents', n, 'n_chars_consistent', n_chars_consistent FROM d
          UNION ALL SELECT 'documents', n, 'text_not_empty', text_not_empty FROM d
          UNION ALL SELECT 'supplier', n, 'acctbal_nonnegative', acctbal_nonnegative FROM s)
        SELECT table_name, rule,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_violations AS BIGINT) AS n_violations,
               n_violations * 1.0 / n_rows AS viol_rate,
               n_violations = 0 AS pass
        FROM rows_out
        ORDER BY table_name, rule
      """.trim),
      (s, d) => {
        import s.implicits._
        val o = tableRules("orders", orders(s, d), Seq(
          "totalprice_positive" -> !($"o_totalprice" > 0.0),
          "orderdate_in_range" ->
            !($"o_orderdate" >= "1995-01-01" && $"o_orderdate" < "2002-01-01"),
          "status_in_set" -> !$"o_orderstatus".isin("O", "F", "P")))
        val l = tableRules("lineitem", lineitem(s, d), Seq(
          "quantity_in_range" -> !($"l_quantity" >= 1.0 && $"l_quantity" <= 50.0),
          "discount_in_range" -> !($"l_discount" >= 0.0 && $"l_discount" <= 0.2)))
        // referential rule: anti-join count, with the row denominator
        // from the (already computed once) lineitem scan
        val lr = lineitem(s, d).select($"l_orderkey")
          .join(orders(s, d).select($"o_orderkey"),
            $"o_orderkey" === $"l_orderkey", "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .crossJoin(lineitem(s, d).agg(count(lit(1)).as("n_rows")))
          .select(lit("lineitem").as("table_name"), $"n_rows",
            lit("orderkey_in_orders").as("rule"), $"n_violations".cast("long"))
        val c = tableRules("customer", customer(s, d), Seq(
          "mktsegment_in_set" -> !$"c_mktsegment".isin(
            "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE", "MACHINERY"),
          "acctbal_not_null" -> $"c_acctbal".isNull))
        val e = tableRules("events", events(s, d), Seq(
          "value_positive" -> !($"value" > 0.0),
          "event_type_in_set" -> !$"event_type".isin(
            "view", "click", "purchase", "signup", "error")))
        val dd = tableRules("documents", documents(s, d), Seq(
          "n_chars_consistent" -> ($"n_chars" =!= length($"text")),
          "text_not_empty" -> ($"text" === "" || $"text".isNull)))
        val su = tableRules("supplier", supplier(s, d), Seq(
          "acctbal_nonnegative" -> ($"s_acctbal" < 0.0)))
        Seq(o, l, lr, c, e, dd, su)
          .map(_.select($"table_name", $"n_rows", $"rule", $"n_violations"))
          .reduce(_ union _)
          .select($"table_name", $"rule",
            $"n_rows".cast("long").as("n_rows"), $"n_violations",
            ($"n_violations" * lit(1.0) / $"n_rows").as("viol_rate"),
            ($"n_violations" === 0).as("pass"))
          .orderBy($"table_name", $"rule")
      }))
}
