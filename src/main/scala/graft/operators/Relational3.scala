package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Classic warehouse report shapes over the TPC-H-ish tables: national
  * market share within a region (the TPC-H Q8 shape) and promotional
  * revenue share by month (the Q14 shape). Both are the canonical
  * star-join + ratio-of-conditional-sums pattern: every dimension side
  * is broadcast (region/nation/customer/supplier/part are the small
  * sides at any scale — the fact table never moves for them), revenue
  * sums route through DECIMAL, and each ratio is one double division.
  */
object Relational3 {

  val defs: Seq[QueryDef] = Seq(

    // Market share of ASIA-nation suppliers in revenue billed to ASIA
    // customers, per order year: lineitem joins orders (fact-fact,
    // the one shuffle), every dimension lookup broadcast. The share
    // numerator is a conditional DECIMAL sum over the same rows as
    // the denominator — one aggregation, not two scans.
    QueryDef(
      "q40_market_share",
      Some(s"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               ${sqlSum("CASE WHEN sn.n_name = 'NATION_5' THEN l_extendedprice*(1.0-l_discount) ELSE CAST(0.0 AS DOUBLE) END", 6)}
                 / ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS mkt_share,
               ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS total_revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region cr ON cr.r_regionkey = cn.n_regionkey AND cr.r_name = 'ASIA'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        GROUP BY EXTRACT(year FROM o_orderdate)
        ORDER BY o_year
      """.trim),
      (s, d) => {
        import s.implicits._
        val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
        lineitem(s, d)
          .join(orders(s, d), $"o_orderkey" === $"l_orderkey")
          .join(broadcast(customer(s, d)), $"c_custkey" === $"o_custkey")
          .join(broadcast(nation(s, d).as("cn")), $"cn.n_nationkey" === $"c_nationkey")
          .join(broadcast(region(s, d).as("cr")),
            $"cr.r_regionkey" === $"cn.n_regionkey" && $"cr.r_name" === "ASIA")
          .join(broadcast(supplier(s, d)), $"s_suppkey" === $"l_suppkey")
          .join(broadcast(nation(s, d).as("sn")), $"sn.n_nationkey" === $"s_nationkey")
          .groupBy(year($"o_orderdate").cast("long").as("o_year"))
          .agg(
            (dsum(when($"sn.n_name" === "NATION_5", rev).otherwise(lit(0.0)), 6)
              / dsum(rev, 6)).as("mkt_share"),
            dsum(rev, 6).as("total_revenue"))
          .orderBy($"o_year")
      }),

    // Promotional revenue share by ship month: lineitem joins the
    // broadcast part dimension; promo share = conditional sum /
    // total sum in the one aggregation. The 100× percent scaling is
    // an exact power-of-ten double product applied after the division.
    QueryDef(
      "q41_promo_revenue",
      Some(s"""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               100.0 * ${sqlSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1.0-l_discount) ELSE CAST(0.0 AS DOUBLE) END", 6)}
                 / ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS promo_pct,
               ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS total_revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        GROUP BY strftime(l_shipdate, '%Y-%m')
        ORDER BY ship_month
      """.trim),
      (s, d) => {
        import s.implicits._
        val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
        lineitem(s, d)
          .join(broadcast(part(s, d)), $"p_partkey" === $"l_partkey")
          .groupBy(date_format($"l_shipdate", "yyyy-MM").as("ship_month"))
          .agg(
            (lit(100.0) * dsum(when($"p_type" === "PROMO", rev).otherwise(lit(0.0)), 6)
              / dsum(rev, 6)).as("promo_pct"),
            dsum(rev, 6).as("total_revenue"))
          .orderBy($"ship_month")
      }))
}
