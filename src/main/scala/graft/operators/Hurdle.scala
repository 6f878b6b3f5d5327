package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Two-part (hurdle) revenue decomposition of the A/B contrast
  * (Cragg, Econometrica 1971; the standard zero-inflated-revenue
  * reading): per-user revenue R = p·m where p is the purchase
  * incidence and m the mean spend GIVEN purchase. The treatment
  * effect on R decomposes exactly as ΔR = Δp·m₀ + p₀·Δm + Δp·Δm —
  * how much came from converting MORE users vs existing buyers
  * spending more vs the interaction. The decomposition is what makes
  * a flat topline diagnosable: offsetting ± parts are invisible in
  * ev_ab_ttest.
  *
  * Determinism: incidence counts and cent-scaled spend sums are
  * exact; every rate/mean/Δ-part is a fixed-order double from those
  * exact sums, snapped.
  *
  * Scale: one per-user aggregate → one per-arm fold of four counters
  * — mergeable end to end.
  */
object Hurdle {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_hurdle_decomposition",
      Some(s"""
        WITH u AS (
          SELECT user_id, user_id % 2 AS arm,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
                   * 100 AS BIGINT) AS rev
          FROM events GROUP BY user_id),
        g AS (
          SELECT arm, COUNT(*) AS n,
                 SUM(CASE WHEN rev > 0 THEN 1 ELSE 0 END) AS n_buy,
                 SUM(CAST(rev AS HUGEINT)) AS s
          FROM u GROUP BY arm),
        wide AS (
          SELECT
            MAX(CASE WHEN arm = 0 THEN n END) AS n0,
            MAX(CASE WHEN arm = 1 THEN n END) AS n1,
            MAX(CASE WHEN arm = 0 THEN n_buy END) AS b0,
            MAX(CASE WHEN arm = 1 THEN n_buy END) AS b1,
            MAX(CASE WHEN arm = 0 THEN CAST(s AS DOUBLE) END) AS s0,
            MAX(CASE WHEN arm = 1 THEN CAST(s AS DOUBLE) END) AS s1
          FROM g),
        parts AS (
          SELECT n0, n1, b0, b1,
                 b0 * 1.0 / n0 AS p0, b1 * 1.0 / n1 AS p1,
                 s0 / b0 / 100.0 AS m0, s1 / b1 / 100.0 AS m1,
                 s0 / n0 / 100.0 AS r0, s1 / n1 / 100.0 AS r1
          FROM wide)
        SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
               ${det.sqlSnap9("p0")} AS p_control, ${det.sqlSnap9("p1")} AS p_treat,
               ${det.sqlSnap9("m0")} AS spend_control, ${det.sqlSnap9("m1")} AS spend_treat,
               ${det.sqlSnap9("r1 - r0")} AS delta_revenue,
               ${det.sqlSnap9("(p1 - p0) * m0")} AS part_incidence,
               ${det.sqlSnap9("p0 * (m1 - m0)")} AS part_spend,
               ${det.sqlSnap9("(p1 - p0) * (m1 - m0)")} AS part_interaction
        FROM parts
      """.trim),
      (s, d) => {
        import s.implicits._
        val u = events(s, d)
          .groupBy($"user_id", ($"user_id" % 2).as("arm"))
          .agg((sum(when($"event_type" === "purchase",
            $"value".cast(DecimalType(18, 2)))
            .otherwise(lit(0).cast(DecimalType(18, 2)))) * 100)
            .cast("long").as("rev"))
        val g = u.groupBy($"arm")
          .agg(count(lit(1)).as("n"),
            sum(when($"rev" > 0, 1).otherwise(0)).as("n_buy"),
            sum($"rev".cast(DecimalType(38, 0))).as("s"))
        val wide = g.agg(
          max(when($"arm" === 0, $"n")).as("n0"),
          max(when($"arm" === 1, $"n")).as("n1"),
          max(when($"arm" === 0, $"n_buy")).as("b0"),
          max(when($"arm" === 1, $"n_buy")).as("b1"),
          max(when($"arm" === 0, $"s".cast("double"))).as("s0"),
          max(when($"arm" === 1, $"s".cast("double"))).as("s1"))
        val parts = wide.select($"n0", $"n1", $"b0", $"b1",
          ($"b0" * lit(1.0) / $"n0").as("p0"),
          ($"b1" * lit(1.0) / $"n1").as("p1"),
          ($"s0" / $"b0" / 100.0).as("m0"),
          ($"s1" / $"b1" / 100.0).as("m1"),
          ($"s0" / $"n0" / 100.0).as("r0"),
          ($"s1" / $"n1" / 100.0).as("r1"))
        parts.select(
          $"n0".cast("long").as("n_control"), $"n1".cast("long").as("n_treat"),
          det.snap9($"p0").as("p_control"), det.snap9($"p1").as("p_treat"),
          det.snap9($"m0").as("spend_control"), det.snap9($"m1").as("spend_treat"),
          det.snap9($"r1" - $"r0").as("delta_revenue"),
          det.snap9(($"p1" - $"p0") * $"m0").as("part_incidence"),
          det.snap9($"p0" * ($"m1" - $"m0")).as("part_spend"),
          det.snap9(($"p1" - $"p0") * ($"m1" - $"m0")).as("part_interaction"))
      }))
}
