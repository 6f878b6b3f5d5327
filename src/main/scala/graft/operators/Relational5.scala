package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Five more classic warehouse report shapes (the remaining TPC-H
  * archetypes not yet on the surface), adapted to this schema — there
  * is no partsupp table, so per-(supplier, part) supply cost and stock
  * are derived from lineitem itself:
  *
  *  - q52: product-line profit by supplier nation × ship year
  *    (the Q9 shape; cost proxied as 0.6·p_retailprice·l_quantity),
  *  - q53: parts holding an outsized share of European supply value
  *    (the Q11 scalar-threshold shape),
  *  - q54: cheapest-supplier-per-part directory for one part class
  *    (the Q2 min-cost correlated-subquery shape, as ONE window rank),
  *  - q55: supplier variety per (brand, type, size band) excluding
  *    flagged suppliers (the Q16 NOT-IN + count-distinct shape),
  *  - q56: suppliers dominating a part's 1998 shipments of one
  *    product line (the Q20 half-of-total nested-aggregate shape).
  *
  * Scale notes: part/supplier/nation/region sides are broadcast
  * everywhere; the only real shuffles are the lineitem groupBys, all
  * map-side combined on bounded keys ((supplier, part) pairs at worst).
  * q54 replaces Q2's correlated MIN subquery — a second full scan in
  * the naive plan — with one rank window over the already-aggregated
  * per-pair cost table, and q56 replaces Q20's correlated half-of-total
  * with a self-groupBy reusing the SAME aggregate, so each query scans
  * lineitem exactly once. Money sums route through DECIMAL (dsum) so
  * results are partitioning-independent; unit costs are single IEEE
  * divisions of identical inputs, bit-equal across engines.
  */
object Relational5 {

  val defs: Seq[QueryDef] = Seq(

    // Q9 shape: profit contribution of the 'red' product line by the
    // supplying nation and ship year. One fact scan; every dimension
    // broadcast; the name filter prunes part BEFORE the join so the
    // fact rows of other lines never reach the aggregate.
    QueryDef(
      "q52_product_profit",
      Some(s"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
               ${sqlSum("l_extendedprice*(1.0-l_discount) - 0.6*p_retailprice*l_quantity", 6)} AS profit
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey AND p_name LIKE 'red%'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        GROUP BY n_name, EXTRACT(year FROM l_shipdate)
        ORDER BY nation, o_year
      """.trim),
      (s, d) => {
        import s.implicits._
        val profit = $"l_extendedprice" * (lit(1.0) - $"l_discount") -
          lit(0.6) * $"p_retailprice" * $"l_quantity"
        lineitem(s, d)
          .join(broadcast(part(s, d).filter($"p_name".like("red%"))),
            $"p_partkey" === $"l_partkey")
          .join(broadcast(supplier(s, d)), $"s_suppkey" === $"l_suppkey")
          .join(broadcast(nation(s, d)), $"n_nationkey" === $"s_nationkey")
          .groupBy($"n_name".as("nation"), year($"l_shipdate").cast("long").as("o_year"))
          .agg(dsum(profit, 6).as("profit"))
          .orderBy($"nation", $"o_year")
      }),

    // Q11 shape: which parts hold an outsized share (1.8× the mean
    // per-part value — scale-free, where Q11's fixed fraction empties
    // as the part count grows) of European supply value? The threshold
    // is a one-row scalar broadcast; the per-part value table is built
    // once and reused for both sides of the comparison (Q11's plan
    // re-aggregates the fact table twice).
    QueryDef(
      "q53_important_parts",
      Some(s"""
        WITH v AS (
          SELECT l_partkey,
                 ${sqlSum("l_quantity * p_retailprice", 2)} AS value
          FROM lineitem
          JOIN part     ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation   ON n_nationkey = s_nationkey
          JOIN region   ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
          GROUP BY l_partkey),
        t AS (
          SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 1.8 / COUNT(*) AS thr FROM v)
        SELECT CAST(l_partkey AS BIGINT) AS partkey, value
        FROM v CROSS JOIN t
        WHERE value > thr
        ORDER BY value DESC, partkey
      """.trim),
      (s, d) => {
        import s.implicits._
        val v = lineitem(s, d)
          .join(broadcast(part(s, d)), $"p_partkey" === $"l_partkey")
          .join(broadcast(supplier(s, d)), $"s_suppkey" === $"l_suppkey")
          .join(broadcast(nation(s, d)), $"n_nationkey" === $"s_nationkey")
          .join(broadcast(region(s, d)),
            $"r_regionkey" === $"n_regionkey" && $"r_name" === "EUROPE")
          .groupBy($"l_partkey")
          .agg(dsum($"l_quantity" * $"p_retailprice", 2).as("value"))
        val thr = v.agg((sum($"value".cast(DecimalType(18, 2))).cast("double") *
          lit(1.8) / count(lit(1))).as("thr"))
        v.crossJoin(broadcast(thr))
          .filter($"value" > $"thr")
          .select($"l_partkey".cast("long").as("partkey"), $"value")
          .orderBy($"value".desc, $"partkey")
      }),

    // Q2 shape: for every SMALL size-15 part, the cheapest European
    // supplier (observed min unit price over its shipments). The
    // correlated MIN subquery of the original becomes one row_number
    // window over the per-(part, supplier) cost aggregate — a single
    // fact scan and a single narrow window instead of two scans.
    QueryDef(
      "q54_min_cost_supplier",
      Some("""
        WITH cost AS (
          SELECT l_partkey, l_suppkey,
                 MIN(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem GROUP BY l_partkey, l_suppkey),
        r AS (
          SELECT p_partkey, s_name, s_acctbal, n_name, unit_cost,
                 ROW_NUMBER() OVER (PARTITION BY p_partkey
                                    ORDER BY unit_cost, l_suppkey) AS rk
          FROM cost
          JOIN part     ON p_partkey = l_partkey AND p_size = 15 AND p_type = 'SMALL'
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation   ON n_nationkey = s_nationkey
          JOIN region   ON r_regionkey = n_regionkey AND r_name = 'EUROPE')
        SELECT s_acctbal, s_name, n_name, CAST(p_partkey AS BIGINT) AS partkey, unit_cost
        FROM r WHERE rk = 1
        ORDER BY s_acctbal DESC, n_name, s_name, partkey
        LIMIT 100
      """.trim),
      (s, d) => {
        import s.implicits._
        val cost = lineitem(s, d)
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(min($"l_extendedprice" / $"l_quantity").as("unit_cost"))
        val ranked = cost
          .join(broadcast(part(s, d).filter($"p_size" === 15 && $"p_type" === "SMALL")),
            $"p_partkey" === $"l_partkey")
          .join(broadcast(supplier(s, d)), $"s_suppkey" === $"l_suppkey")
          .join(broadcast(nation(s, d)), $"n_nationkey" === $"s_nationkey")
          .join(broadcast(region(s, d)),
            $"r_regionkey" === $"n_regionkey" && $"r_name" === "EUROPE")
          .withColumn("rk", row_number().over(
            Window.partitionBy($"p_partkey").orderBy($"unit_cost", $"l_suppkey")))
        ranked.filter($"rk" === 1)
          .select($"s_acctbal", $"s_name", $"n_name",
            $"p_partkey".cast("long").as("partkey"), $"unit_cost")
          .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"partkey")
          .limit(100)
      }),

    // Q16 shape: how many distinct suppliers serve each (brand, type,
    // size band), once one brand, one type, and negative-balance
    // ("complaint") suppliers are excluded. The supplier exclusion is
    // a broadcast NOT-IN (6 keys); the distinct count is the only
    // shuffle and is combined map-side on the bounded band keys.
    QueryDef(
      "q55_supplier_variety",
      Some("""
        SELECT p_brand, p_type,
               CAST(floor((p_size - 1) / 10.0) AS BIGINT) AS size_band,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY p_brand, p_type, floor((p_size - 1) / 10.0)
        ORDER BY supplier_cnt DESC, p_brand, p_type, size_band
      """.trim),
      (s, d) => {
        import s.implicits._
        val flagged = supplier(s, d).filter($"s_acctbal" < 0.0).select($"s_suppkey")
        lineitem(s, d)
          .join(broadcast(part(s, d).filter(
            $"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO")),
            $"p_partkey" === $"l_partkey")
          .join(broadcast(flagged), $"s_suppkey" === $"l_suppkey", "left_anti")
          .groupBy($"p_brand", $"p_type",
            floor(($"p_size" - 1) / 10.0).cast("long").as("size_band"))
          .agg(countDistinct($"l_suppkey").cast("long").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"size_band")
      }),

    // Q20 shape: suppliers that shipped more than half of a part's
    // total 1998 volume of the 'hot' line. Q20's correlated
    // half-of-availqty subquery becomes a self-groupBy of the SAME
    // per-(part, supplier) aggregate — the fact table is scanned once,
    // and the per-part totals are derived from the (much smaller)
    // aggregate, not re-scanned.
    QueryDef(
      "q56_part_promotion",
      Some("""
        WITH shipped AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
          FROM lineitem
          JOIN part ON p_partkey = l_partkey AND p_name LIKE 'hot%'
          WHERE l_shipdate >= DATE '1998-01-01' AND l_shipdate < DATE '1999-01-01'
          GROUP BY l_partkey, l_suppkey),
        tot AS (
          SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey)
        SELECT DISTINCT s_name, n_name
        FROM shipped
        JOIN tot USING (l_partkey)
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE CAST(qty AS DOUBLE) > 0.5 * CAST(total_qty AS DOUBLE)
        ORDER BY s_name, n_name
      """.trim),
      (s, d) => {
        import s.implicits._
        val shipped = lineitem(s, d)
          .filter($"l_shipdate" >= "1998-01-01" && $"l_shipdate" < "1999-01-01")
          .join(broadcast(part(s, d).filter($"p_name".like("hot%"))),
            $"p_partkey" === $"l_partkey")
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(sum($"l_quantity".cast(DecimalType(18, 2))).as("qty"))
          // both the per-supplier side and the per-part total derive from
          // this aggregate: materialize it so lineitem is scanned ONCE
          .localCheckpoint()
        val tot = shipped.groupBy($"l_partkey").agg(sum($"qty").as("total_qty"))
        shipped.join(tot, "l_partkey")
          .filter($"qty".cast("double") > lit(0.5) * $"total_qty".cast("double"))
          .join(broadcast(supplier(s, d)), $"s_suppkey" === $"l_suppkey")
          .join(broadcast(nation(s, d)), $"n_nationkey" === $"s_nationkey")
          .select($"s_name", $"n_name").distinct()
          .orderBy($"s_name", $"n_name")
      }))
}
