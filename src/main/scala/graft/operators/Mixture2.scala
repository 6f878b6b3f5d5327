package graft.operators

import graft.QueryDef
import graft.det._
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temperature-scaled mixture sampling and two more classic warehouse
  * report shapes.
  *
  * pl_mixture_temperature: pl_mixture's proportional split flattened
  * by temperature τ = 1/2 — target_s ∝ n_s^τ, the standard rebalance
  * that keeps small sources represented without letting them dominate
  * (multilingual-sampling practice). τ = 1/2 is deliberate: n^0.5 is
  * ONE IEEE sqrt of an exact integer — correctly rounded in both
  * engines — where a general pow() is not bit-portable. Per-source
  * selection is deterministic hash order, like every sampler here.
  */
object Mixture2 {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "pl_mixture_temperature", {
        val h = PortableHash.sqlH32("CAST(doc_id AS VARCHAR)")
        Some(s"""
        WITH src AS (
          SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        w AS (
          SELECT source, n,
                 floor(sqrt(CAST(n AS DOUBLE)) * 1000000000 + 0.5) / 1000000000 AS wt
          FROM src),
        tot AS (
          SELECT CAST(SUM(CAST(wt AS DECIMAL(28,12))) AS DOUBLE) AS tw FROM w),
        tgt AS (
          SELECT source, n, wt,
                 CAST(floor(100 * wt / tot.tw) AS BIGINT) AS target
          FROM w CROSS JOIN tot),
        ranked AS (
          SELECT d.source, d.doc_id,
                 row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY $h, d.doc_id) AS rk
          FROM documents d),
        sel AS (
          SELECT r.source, COUNT(*) AS n_selected
          FROM ranked r JOIN tgt t ON t.source = r.source
          WHERE r.rk <= t.target
          GROUP BY r.source)
        SELECT t.source, CAST(t.n AS BIGINT) AS n_source, t.wt AS weight,
               t.target, CAST(COALESCE(s.n_selected, 0) AS BIGINT) AS n_selected
        FROM tgt t LEFT JOIN sel s ON s.source = t.source
        ORDER BY t.source
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val src = documents(s, d).groupBy($"source").agg(count(lit(1)).as("n"))
        val w = src.select($"source", $"n",
          (floor(sqrt($"n".cast("double")) * lit(1e9) + lit(0.5)) / lit(1e9)).as("wt"))
        val tot = w.agg(sum($"wt".cast(DecimalType(28, 12))).cast("double").as("tw"))
        val tgt = w.crossJoin(broadcast(tot))
          .select($"source", $"n", $"wt",
            floor(lit(100) * $"wt" / $"tw").cast("long").as("target"))
          .persist()
        val ranked = documents(s, d)
          .select($"source", $"doc_id",
            PortableHash.h32($"doc_id".cast("string")).as("h"))
          .withColumn("rk", row_number().over(
            Window.partitionBy($"source").orderBy($"h", $"doc_id")))
        val sel = ranked.join(tgt.select($"source", $"target"), "source")
          .filter($"rk" <= $"target")
          .groupBy($"source").agg(count(lit(1)).as("n_selected"))
        tgt.join(sel, Seq("source"), "left")
          .select($"source", $"n".as("n_source"), $"wt".as("weight"),
            $"target", coalesce($"n_selected", lit(0L)).as("n_selected"))
          .orderBy($"source")
      }),

    // TPC-H Q15 shape: each year's top-revenue supplier — a grouped
    // aggregate plus ONE per-year ranking window over |suppliers|
    // rows, never a global sort.
    QueryDef(
      "q42_top_supplier",
      Some(s"""
        WITH rev AS (
          SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
                 l_suppkey,
                 ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS revenue
          FROM lineitem GROUP BY EXTRACT(year FROM l_shipdate), l_suppkey),
        top AS (
          SELECT ship_year, l_suppkey, revenue,
                 row_number() OVER (PARTITION BY ship_year
                                    ORDER BY revenue DESC, l_suppkey) AS rk
          FROM rev)
        SELECT t.ship_year, s.s_name, t.revenue
        FROM top t JOIN supplier s ON s.s_suppkey = t.l_suppkey
        WHERE t.rk = 1
        ORDER BY t.ship_year
      """.trim),
      (s, d) => {
        import s.implicits._
        val rev = lineitem(s, d)
          .groupBy(year($"l_shipdate").cast("long").as("ship_year"), $"l_suppkey")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
        val top = rev.withColumn("rk", row_number().over(
          Window.partitionBy($"ship_year").orderBy($"revenue".desc, $"l_suppkey")))
          .filter($"rk" === 1)
        top.join(broadcast(supplier(s, d)), $"s_suppkey" === $"l_suppkey")
          .select($"ship_year", $"s_name", $"revenue")
          .orderBy($"ship_year")
      }),

    // TPC-H Q10 shape: customers ranked by revenue from RETURNED
    // items — the churn-risk report. Fact-fact join shuffles once;
    // customer/nation lookups broadcast; top-20 is a
    // TakeOrderedAndProject.
    QueryDef(
      "q43_returned_revenue",
      Some(s"""
        SELECT c_custkey, c_name, n_name,
               ${sqlSum("l_extendedprice*(1.0-l_discount)", 6)} AS lost_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
      """.trim),
      (s, d) => {
        import s.implicits._
        lineitem(s, d).filter($"l_returnflag" === "R")
          .join(orders(s, d), $"o_orderkey" === $"l_orderkey")
          .join(broadcast(customer(s, d)), $"c_custkey" === $"o_custkey")
          .join(broadcast(nation(s, d)), $"n_nationkey" === $"c_nationkey")
          .groupBy($"c_custkey", $"c_name", $"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("lost_revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy($"lost_revenue".desc, $"c_custkey")
          .limit(20)
      }))
}
