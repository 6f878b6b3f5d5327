package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-column categorical drift dashboard: the Population Stability
  * Index of each low-cardinality orders column (status, priority)
  * between the first and second half of the order history —
  * PSI = Σ (p₂−p₁)·ln(p₂/p₁) over category shares. The column-wise
  * twin of ev_psi (which bins a numeric on events): one melt feeds
  * every column through a single aggregate, the q33/dq_profile
  * discipline (never one pass per column).
  *
  * Categories absent from a period get a 0.0001 floor share, the
  * industry-standard PSI smoothing, applied identically in both
  * engines.
  *
  * Determinism: counts are exact; shares and each PSI term are
  * fixed-order doubles (term snapped, folded in DECIMAL).
  *
  * Scale: one melt (2× row multiplier), two hash aggregates, a
  * bounded category-level fold — no per-column scans.
  */
object CategoricalPsi {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_categorical_psi",
      Some(s"""
        WITH mid AS (
          SELECT (MIN(epoch_us(o_orderdate)) + MAX(epoch_us(o_orderdate))) // 2
            AS m FROM orders),
        melt AS (
          SELECT 'orderstatus' AS col, o_orderstatus AS val,
                 CASE WHEN epoch_us(o_orderdate) < m THEN 0 ELSE 1 END AS period
          FROM orders CROSS JOIN mid
          UNION ALL
          SELECT 'orderpriority', o_orderpriority,
                 CASE WHEN epoch_us(o_orderdate) < m THEN 0 ELSE 1 END
          FROM orders CROSS JOIN mid),
        cnt AS (
          SELECT col, val, period, COUNT(*) AS c
          FROM melt GROUP BY 1, 2, 3),
        tot AS (
          SELECT col, period, SUM(c) AS t FROM cnt GROUP BY col, period),
        cats AS (SELECT DISTINCT col, val FROM cnt),
        shares AS (
          SELECT cats.col, cats.val, p.period,
                 GREATEST(COALESCE(c.c, 0) * 1.0 / t.t, 0.0001) AS share
          FROM cats
          CROSS JOIN (SELECT UNNEST([0, 1]) AS period) p
          JOIN tot t ON t.col = cats.col AND t.period = p.period
          LEFT JOIN cnt c ON c.col = cats.col AND c.val = cats.val
                          AND c.period = p.period),
        wide AS (
          SELECT col, val,
                 MAX(CASE WHEN period = 0 THEN share END) AS p1,
                 MAX(CASE WHEN period = 1 THEN share END) AS p2
          FROM shares GROUP BY col, val),
        terms AS (
          SELECT col,
                 CAST(${det.sqlSnap9("(p2 - p1) * ln(p2 / p1)")}
                   AS DECIMAL(28,12)) AS term
          FROM wide)
        SELECT col, CAST(COUNT(*) AS BIGINT) AS n_categories,
               CAST(SUM(term) AS DOUBLE) AS psi
        FROM terms GROUP BY col
        ORDER BY col
      """.trim),
      (s, d) => {
        import s.implicits._
        val ords = orders(s, d)
        val mid = ords.agg(expr(
          "(min(unix_micros(CAST(o_orderdate AS TIMESTAMP))) + max(unix_micros(CAST(o_orderdate AS TIMESTAMP)))) div 2")
          .as("m"))
        val melt = ords.crossJoin(broadcast(mid))
          .select(explode(array(
            struct(lit("orderstatus").as("col"), $"o_orderstatus".as("val")),
            struct(lit("orderpriority").as("col"), $"o_orderpriority".as("val"))))
            .as("kv"),
            when(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))") < $"m", 0)
              .otherwise(1).as("period"))
          .select($"kv.col".as("col"), $"kv.val".as("val"), $"period")
        val cnt = melt.groupBy($"col", $"val", $"period")
          .agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy($"col".as("t_col"), $"period".as("t_p"))
          .agg(sum($"c").as("t"))
        val cats = cnt.select($"col", $"val").distinct()
        val periods = Seq(0, 1).toDF("p_period")
        val shares = cats.crossJoin(periods)
          .join(tot, $"col" === $"t_col" && $"p_period" === $"t_p")
          .join(cnt.select($"col".as("c_col"), $"val".as("c_val"),
            $"period".as("c_p"), $"c"),
            $"col" === $"c_col" && $"val" === $"c_val"
              && $"p_period" === $"c_p", "left")
          .select($"col", $"val", $"p_period".as("period"),
            greatest(coalesce($"c", lit(0L)) * lit(1.0) / $"t", lit(0.0001))
              .as("share"))
        val wide = shares.groupBy($"col", $"val")
          .agg(max(when($"period" === 0, $"share")).as("p1"),
            max(when($"period" === 1, $"share")).as("p2"))
        val terms = wide.select($"col",
          det.snap9(($"p2" - $"p1") * log($"p2" / $"p1"))
            .cast(DecimalType(28, 12)).as("term"))
        terms.groupBy($"col")
          .agg(count(lit(1)).cast("long").as("n_categories"),
            sum($"term").cast("double").as("psi"))
          .orderBy($"col")
      }))
}
