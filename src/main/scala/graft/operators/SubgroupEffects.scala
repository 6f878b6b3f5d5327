package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Subgroup treatment effects with Holm–Bonferroni control (Holm,
  * Scand. J. Stat. 1979): the per-event-type A/B contrast (Welch t on
  * the value metric) is only trustworthy after multiple-testing
  * correction — with m subgroups, the k-th largest |t| must clear the
  * z-critical value for α/(m−k+1), and testing stops at the first
  * failure (every later subgroup is auto-accepted as null). The
  * step-down ladder is what separates "we sliced until something was
  * significant" from a real heterogeneous effect.
  *
  * Critical values are quoted two-sided normal quantiles for
  * α = 0.05 (m = 5): 2.576, 2.498, 2.394, 2.241, 1.960.
  *
  * Determinism: per-arm moments are cent-scaled HUGEINT/DECIMAL sums;
  * each t is one fixed-order double expression, snapped; the ladder
  * is an integer-rank join against literal criticals and a cumulative
  * boolean over the m-row (bounded) window.
  *
  * Scale: ONE hash aggregate to (subgroup, arm) — six mergeable
  * counters per cell; everything after is an m-row fold.
  */
object SubgroupEffects {

  // two-sided z quantiles for alpha/(m-k+1), alpha=0.05, m=5
  private val crits = Seq("2.576", "2.498", "2.394", "2.241", "1.960")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_subgroup_effects", {
        val critRows = crits.zipWithIndex
          .map { case (c, i) => s"(${i + 1}, $c)" }.mkString(", ")
        Some(s"""
        WITH e AS (
          SELECT event_type, user_id % 2 AS arm,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
          FROM events),
        g AS (
          SELECT event_type, arm, COUNT(*) AS n,
                 SUM(CAST(v AS HUGEINT)) AS s1,
                 SUM(CAST(v AS HUGEINT) * v) AS s2
          FROM e GROUP BY event_type, arm),
        cells AS (
          SELECT event_type,
                 MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                 MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                 MAX(CASE WHEN arm = 1 THEN CAST(s1 AS DOUBLE) END) AS s11,
                 MAX(CASE WHEN arm = 0 THEN CAST(s1 AS DOUBLE) END) AS s10,
                 MAX(CASE WHEN arm = 1 THEN CAST(s2 AS DOUBLE) END) AS s21,
                 MAX(CASE WHEN arm = 0 THEN CAST(s2 AS DOUBLE) END) AS s20
          FROM g GROUP BY event_type),
        tt AS (
          SELECT event_type, n1, n0,
                 ${det.sqlSnap9("(s11 / n1 - s10 / n0) / 100.0")} AS diff,
                 ${det.sqlSnap9(
          "(s11 / n1 - s10 / n0)" +
            " / sqrt((s21 - s11 * s11 / n1) / (n1 - 1.0) / n1" +
            "      + (s20 - s10 * s10 / n0) / (n0 - 1.0) / n0)")} AS t
          FROM cells),
        ranked AS (
          SELECT event_type, n1, n0, diff, t,
                 ROW_NUMBER() OVER (ORDER BY ABS(t) DESC, event_type) AS k
          FROM tt),
        cr(k, crit) AS (VALUES $critRows),
        laddered AS (
          SELECT r.event_type, r.n1, r.n0, r.diff, r.t, r.k, cr.crit,
                 MIN(CASE WHEN ABS(r.t) >= cr.crit THEN 1 ELSE 0 END)
                   OVER (ORDER BY r.k ROWS UNBOUNDED PRECEDING) AS rej
          FROM ranked r JOIN cr ON cr.k = r.k)
        SELECT event_type, CAST(k AS BIGINT) AS holm_rank,
               CAST(n1 AS BIGINT) AS n_t, CAST(n0 AS BIGINT) AS n_c,
               diff, t, CAST(crit AS DOUBLE) AS crit,
               rej = 1 AS reject
        FROM laddered
        ORDER BY holm_rank
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val e = events(s, d).select($"event_type",
          ($"user_id" % 2).as("arm"),
          ($"value".cast(DecimalType(18, 2)) * 100).cast("long").as("v"))
        val hug = $"v".cast(DecimalType(38, 0))
        val g = e.groupBy($"event_type", $"arm")
          .agg(count(lit(1)).as("n"), sum(hug).as("s1"),
            sum(hug * $"v").as("s2"))
        val cells = g.groupBy($"event_type")
          .agg(max(when($"arm" === 1, $"n")).as("n1"),
            max(when($"arm" === 0, $"n")).as("n0"),
            max(when($"arm" === 1, $"s1".cast("double"))).as("s11"),
            max(when($"arm" === 0, $"s1".cast("double"))).as("s10"),
            max(when($"arm" === 1, $"s2".cast("double"))).as("s21"),
            max(when($"arm" === 0, $"s2".cast("double"))).as("s20"))
        val tt = cells.select($"event_type", $"n1", $"n0",
          det.snap9(($"s11" / $"n1" - $"s10" / $"n0") / 100.0).as("diff"),
          det.snap9(($"s11" / $"n1" - $"s10" / $"n0")
            / sqrt(($"s21" - $"s11" * $"s11" / $"n1") / ($"n1" - lit(1.0)) / $"n1"
              + ($"s20" - $"s10" * $"s10" / $"n0") / ($"n0" - lit(1.0)) / $"n0"))
            .as("t"))
        // m = |event types| is a bounded dimension (≤ a handful), so the
        // unpartitioned ladder windows run over m rows, not data rows
        val ranked = tt.withColumn("k",
          row_number().over(Window.orderBy(abs($"t").desc, $"event_type")))
        val cr = crits.zipWithIndex
          .map { case (c, i) => ((i + 1).toLong, c.toDouble) }
          .toDF("ck", "crit")
        val lw = Window.orderBy($"k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ranked.join(broadcast(cr), $"k" === $"ck")
          .withColumn("rej",
            min(when(abs($"t") >= $"crit", 1).otherwise(0)).over(lw))
          .select($"event_type", $"k".cast("long").as("holm_rank"),
            $"n1".cast("long").as("n_t"), $"n0".cast("long").as("n_c"),
            $"diff", $"t", $"crit", ($"rej" === 1).as("reject"))
          .orderBy($"holm_rank")
      }))
}
