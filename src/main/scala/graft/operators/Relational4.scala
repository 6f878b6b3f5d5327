package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Five more classic warehouse report shapes over the TPC-H-ish tables,
  * adapted to this schema (no commitdate/receiptdate/shipmode columns —
  * lateness is derived as ship-after-order-date+60d):
  *
  *  - q44: priority mix of orders with at least one late shipment
  *    (the Q4 EXISTS/semi-join shape),
  *  - q45: urgent-vs-other order counts per ship-delay class
  *    (the Q12 two-branch conditional-aggregate shape),
  *  - q46: revenue under a three-branch disjunctive brand/size/quantity
  *    predicate (the Q19 OR-pushdown shape),
  *  - q47: suppliers solely responsible for a late multi-supplier order
  *    (the Q21 blame shape, recast as one grouped profile per order —
  *    the EXISTS/NOT-EXISTS double correlation becomes two conditional
  *    distinct-counts, one shuffle instead of three joins),
  *  - q48: high-balance customers idle since 1999 per nation
  *    (the Q22 scalar-subquery + anti-join shape).
  *
  * Scale notes: every dimension side is broadcast; the fact-fact
  * lineitem⋈orders equi-join is the one real shuffle in each query and
  * AQE handles its skew; revenue/balance sums route through DECIMAL so
  * results are partitioning-independent.
  */
object Relational4 {

  val defs: Seq[QueryDef] = Seq(

    // Q4 shape: how often do high-priority orders ship late? The semi
    // join keeps each qualifying order once regardless of how many of
    // its lines were late; the date-range filter prunes the orders scan
    // before the join.
    QueryDef(
      "q44_order_priority",
      Some("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1997-07-01' AND o_orderdate < DATE '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.trim),
      (s, d) => {
        import s.implicits._
        val o = orders(s, d)
          .filter($"o_orderdate" >= "1997-07-01" && $"o_orderdate" < "1997-10-01")
        o.join(lineitem(s, d),
            $"l_orderkey" === $"o_orderkey" &&
              $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).cast("long").as("order_count"))
          .orderBy($"o_orderpriority")
      }),

    // Q12 shape: does shipping speed correlate with order priority?
    // Delay classes replace the missing shipmode column; the two
    // priority branches are conditional sums inside ONE aggregation.
    QueryDef(
      "q45_ship_delay_classes",
      Some("""
        SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) >= 60 THEN 'late'
                    WHEN datediff('day', o_orderdate, l_shipdate) >= 30 THEN 'normal'
                    ELSE 'fast' END AS delay_class,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= DATE '1998-01-01' AND l_shipdate < DATE '1999-01-01'
        GROUP BY 1
        ORDER BY delay_class
      """.trim),
      (s, d) => {
        import s.implicits._
        val delay = datediff($"l_shipdate", $"o_orderdate")
        val high = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
        lineitem(s, d)
          .filter($"l_shipdate" >= "1998-01-01" && $"l_shipdate" < "1999-01-01")
          .join(orders(s, d), $"o_orderkey" === $"l_orderkey")
          .groupBy(
            when(delay >= 60, "late").when(delay >= 30, "normal").otherwise("fast")
              .as("delay_class"))
          .agg(
            sum(when(high, 1).otherwise(0)).cast("long").as("high_line_count"),
            sum(when(!high, 1).otherwise(0)).cast("long").as("low_line_count"))
          .orderBy($"delay_class")
      }),

    // Q19 shape: one revenue number under a disjunction of three
    // brand/size/quantity envelopes. The common l_quantity bounds and
    // the p_partkey equi-key still push down; the OR evaluates inside
    // the broadcast-join's generated code, not as three scans.
    QueryDef(
      "q46_disjunctive_revenue",
      Some(s"""
        SELECT ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
      """.trim),
      (s, d) => {
        import s.implicits._
        val branch = ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) && $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) && $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) && $"l_quantity".between(20, 30))
        lineitem(s, d)
          .join(broadcast(part(s, d)), $"p_partkey" === $"l_partkey")
          .filter(branch)
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"),
            count(lit(1)).cast("long").as("n_lines"))
      }),

    // Q21 shape: which supplier alone made a multi-supplier order late?
    // Rather than EXISTS(another supplier) AND NOT EXISTS(another late
    // supplier) — three correlated fact joins — each order is profiled
    // once (distinct suppliers, distinct late suppliers, the late one
    // via a conditional max) and blame needs just that profile: the
    // same answer in ONE fact-fact shuffle plus a tiny per-order agg.
    QueryDef(
      "q47_blame_supplier",
      Some("""
        WITH prof AS (
          SELECT l_orderkey,
                 COUNT(DISTINCT l_suppkey) AS n_supp,
                 COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                     THEN l_suppkey END) AS n_late,
                 MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                          THEN l_suppkey END) AS late_supp
          FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          GROUP BY l_orderkey)
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM prof JOIN supplier ON s_suppkey = late_supp
        WHERE n_supp >= 2 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
      """.trim),
      (s, d) => {
        import s.implicits._
        val late = $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")
        // Two distinct-aggregate groups make Spark Expand the fact join
        // output x3 before the exchange (one replica per distinct group
        // + one for plain aggregates). Pre-aggregating to the
        // (l_orderkey, l_suppkey) grain first — count/max over that
        // grain are the distinct counts — shuffles each pair once with
        // map-side partial aggregation instead (guide §2.3). Same
        // numbers: n_supp = #pairs, n_late = #pairs with any late line,
        // late_supp = max suppkey among late pairs. NON-NULL
        // assumption (r12 ADVICE): count(*) over the pair grain counts
        // a NULL l_suppkey group where countDistinct ignored it —
        // equivalent only because TPC-H's l_suppkey is NOT NULL (true
        // of every fixture and of the schema this mirrors).
        val prof = lineitem(s, d)
          .join(orders(s, d), $"o_orderkey" === $"l_orderkey")
          .groupBy($"l_orderkey", $"l_suppkey")
          .agg(max(when(late, true).otherwise(false)).as("any_late"))
          .groupBy($"l_orderkey")
          .agg(
            count(lit(1)).as("n_supp"),
            count(when($"any_late", lit(1))).as("n_late"),
            max(when($"any_late", $"l_suppkey")).as("late_supp"))
          .filter($"n_supp" >= 2 && $"n_late" === 1)
        prof.join(broadcast(supplier(s, d)), $"s_suppkey" === $"late_supp")
          .groupBy($"s_name")
          .agg(count(lit(1)).cast("long").as("numwait"))
          .orderBy($"numwait".desc, $"s_name")
          .limit(20)
      }),

    // Q22 shape: wealthy-but-idle customers per nation. The positive-
    // balance average is a scalar (one row, broadcast by the cross
    // join); idleness is an anti join against the date-pruned orders
    // scan — never the full orders table.
    QueryDef(
      "q48_idle_customers",
      Some(s"""
        WITH avg_bal AS (
          SELECT ${sqlAvg("c_acctbal", 2)} AS ab FROM customer WHERE c_acctbal > 0.0)
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               ${sqlSum("c_acctbal", 2)} AS totacctbal
        FROM customer, avg_bal
        WHERE c_acctbal > ab
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= DATE '1999-01-01')
        GROUP BY c_nationkey
        ORDER BY nationkey
      """.trim),
      (s, d) => {
        import s.implicits._
        val c = customer(s, d)
        val avgBal = c.filter($"c_acctbal" > 0.0)
          .agg(davg($"c_acctbal", 2).as("ab"))
        val recent = orders(s, d)
          .filter($"o_orderdate" >= "1999-01-01")
          .select($"o_custkey")
        c.join(broadcast(avgBal))
          .filter($"c_acctbal" > $"ab")
          .join(recent, $"o_custkey" === $"c_custkey", "left_anti")
          .groupBy($"c_nationkey".cast("long").as("nationkey"))
          .agg(count(lit(1)).cast("long").as("numcust"),
            dsum($"c_acctbal", 2).as("totacctbal"))
          .orderBy($"nationkey")
      }),

    // Q7 shape: bilateral trade volume between two nations per year —
    // which direction of the NATION_13↔NATION_19 corridor (populated in both directions at every SF) grows? One
    // fact-fact shuffle; both nation lookups broadcast; the
    // directional pair filter evaluates inside the joins.
    QueryDef(
      "q49_nation_volume",
      Some(s"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
               ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE (sn.n_name = 'NATION_13' AND cn.n_name = 'NATION_19')
           OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_13')
        GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l_shipdate)
        ORDER BY supp_nation, cust_nation, l_year
      """.trim),
      (s, d) => {
        import s.implicits._
        val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
        lineitem(s, d)
          .join(orders(s, d), $"o_orderkey" === $"l_orderkey")
          .join(broadcast(customer(s, d)), $"c_custkey" === $"o_custkey")
          .join(broadcast(supplier(s, d)), $"s_suppkey" === $"l_suppkey")
          .join(broadcast(nation(s, d).as("cn")), $"cn.n_nationkey" === $"c_nationkey")
          .join(broadcast(nation(s, d).as("sn")), $"sn.n_nationkey" === $"s_nationkey")
          .filter(($"sn.n_name" === "NATION_13" && $"cn.n_name" === "NATION_19") ||
            ($"sn.n_name" === "NATION_19" && $"cn.n_name" === "NATION_13"))
          .groupBy($"sn.n_name".as("supp_nation"), $"cn.n_name".as("cust_nation"),
            year($"l_shipdate").cast("long").as("l_year"))
          .agg(dsum(rev, 6).as("revenue"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      }),

    // Q5 shape: revenue kept inside each ASIA nation (customer and
    // supplier co-national) for a two-year window — the local-supplier
    // report. The co-nationality predicate joins two broadcast
    // dimension columns; the orders date filter prunes before the
    // fact-fact shuffle.
    QueryDef(
      "q50_local_supplier",
      Some(s"""
        SELECT n_name,
               ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        JOIN nation   ON n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n_regionkey AND r_name = 'ASIA'
        WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1999-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
      """.trim),
      (s, d) => {
        import s.implicits._
        val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
        lineitem(s, d)
          .join(orders(s, d).filter(
            $"o_orderdate" >= "1997-01-01" && $"o_orderdate" < "1999-01-01"),
            $"o_orderkey" === $"l_orderkey")
          .join(broadcast(customer(s, d)), $"c_custkey" === $"o_custkey")
          .join(broadcast(supplier(s, d)),
            $"s_suppkey" === $"l_suppkey" && $"s_nationkey" === $"c_nationkey")
          .join(broadcast(nation(s, d)), $"n_nationkey" === $"c_nationkey")
          .join(broadcast(region(s, d)),
            $"r_regionkey" === $"n_regionkey" && $"r_name" === "ASIA")
          .groupBy($"n_name")
          .agg(dsum(rev, 6).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      }))
}
