package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sharp regression discontinuity (Thistlethwaite & Campbell 1960;
  * Imbens & Lemieux, J. Econometrics 2008): when "treatment" is
  * assigned by a deterministic score cutoff (here: users whose
  * pre-period engagement ≥ 20 "get the feature"), the causal effect
  * at the margin is the JUMP between two local linear fits of the
  * outcome on the running variable, one per side, within a bandwidth
  * (±15) of the cutoff. The estimator of record for eligibility-
  * threshold launches where an A/B split is impossible.
  *
  * Output: one row per side (n, OLS intercept-at-cutoff, slope) and a
  * row 99 whose `at_cutoff` is the discontinuity estimate
  * (right-limit − left-limit).
  *
  * Determinism: the running variable and the 0/1 outcome are
  * integers, so all OLS moments are exact HUGEINT/DECIMAL sums; the
  * per-side closed form and the jump are fixed-order double
  * expressions, snapped.
  *
  * Scale: one per-user aggregate, then a 2-group moment reduction —
  * mergeable counters after the first combine.
  */
object RegDiscontinuity {

  private val cutoff = 20
  private val bw = 15

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_reg_discontinuity",
      Some(s"""
        WITH u AS (
          SELECT user_id,
                 SUM(CASE WHEN event_type <> 'purchase'
                          AND CAST(ts AS DATE) < DATE '2024-01-15'
                     THEN 1 ELSE 0 END) AS score,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
          FROM events GROUP BY user_id),
        w AS (
          SELECT CASE WHEN score >= $cutoff THEN 1 ELSE 0 END AS side,
                 score - $cutoff AS x, y
          FROM u
          WHERE score >= ${cutoff - bw} AND score < ${cutoff + bw}),
        mo AS (
          SELECT side, COUNT(*) AS n,
                 SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
                 SUM(CAST(x AS HUGEINT) * y) AS sxy,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx
          FROM w GROUP BY side),
        fit0 AS (
          SELECT side, n, sx, sy,
                 CASE WHEN CAST(n AS HUGEINT) * sxx = sx * sx
                      THEN CAST(0 AS DOUBLE)
                      ELSE (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                        / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                 END AS slope
          FROM mo),
        fit AS (
          SELECT side, n, slope,
                 CAST(sy AS DOUBLE) / n - slope * (CAST(sx AS DOUBLE) / n) AS a0
          FROM fit0)
        SELECT CAST(side AS BIGINT) AS side, CAST(n AS BIGINT) AS n,
               ${det.sqlSnap9("a0")} AS at_cutoff,
               ${det.sqlSnap9("slope")} AS slope
        FROM fit
        UNION ALL
        SELECT CAST(99 AS BIGINT), CAST(SUM(n) AS BIGINT),
               ${det.sqlSnap9(
          "SUM(CASE WHEN side = 1 THEN " + det.sqlSnap9("a0") +
            " ELSE 0 END) - SUM(CASE WHEN side = 0 THEN " +
            det.sqlSnap9("a0") + " ELSE 0 END)")},
               CAST(0 AS DOUBLE)
        FROM fit
        ORDER BY side
      """.trim),
      (s, d) => {
        import s.implicits._
        val u = events(s, d)
          .groupBy($"user_id")
          .agg(
            sum(when($"event_type" =!= "purchase"
              && $"ts".cast("date") < lit("2024-01-15").cast("date"), 1)
              .otherwise(0)).as("score"),
            max(when($"event_type" === "purchase", 1).otherwise(0)).as("y"))
        val w = u.filter($"score" >= cutoff - bw && $"score" < cutoff + bw)
          .select(when($"score" >= cutoff, 1).otherwise(0).as("side"),
            ($"score" - cutoff).as("x"), $"y")
        val dx = $"x".cast(DecimalType(38, 0))
        val dy = $"y".cast(DecimalType(38, 0))
        val mo = w.groupBy($"side")
          .agg(count(lit(1)).as("n"),
            sum(dx).as("sx"), sum(dy).as("sy"),
            sum(dx * $"y").as("sxy"), sum(dx * $"x").as("sxx"))
        // Degenerate-side guard (found by the r10 CodegenTriage sweep,
        // latent since birth: at sf0.001 one side's windowed users all
        // share one score, the x-variance is exactly 0 and the ANSI
        // double division throws — count()-shaped gates pruned the
        // projection so no spec ever evaluated it). Zero variance ⇒
        // slope undefined; define slope = 0, a0 = mean(y), decided by
        // the EXACT integer predicate n·sxx = sx² in both engines.
        val degen = $"n".cast(DecimalType(38, 0)) * $"sxx" === $"sx" * $"sx"
        val slope = when(degen, lit(0.0)).otherwise(
          ($"sxy".cast("double") - $"sx".cast("double") * $"sy" / $"n") /
            ($"sxx".cast("double") - $"sx".cast("double") * $"sx" / $"n"))
        val fit = mo.select($"side", $"n", slope.as("slope"),
          ($"sy".cast("double") / $"n"
            - slope * ($"sx".cast("double") / $"n")).as("a0"))
        val sides = fit.select($"side".cast("long").as("side"),
          $"n".cast("long").as("n"),
          det.snap9($"a0").as("at_cutoff"), det.snap9($"slope").as("slope"))
        val jump = fit.agg(
          lit(99L).as("side"), sum($"n").cast("long").as("n"),
          det.snap9(sum(when($"side" === 1, det.snap9($"a0")).otherwise(0.0))
            - sum(when($"side" === 0, det.snap9($"a0")).otherwise(0.0)))
            .as("at_cutoff"),
          lit(0.0).as("slope"))
          .select($"side", $"n", $"at_cutoff", $"slope")
        sides.unionByName(jump).orderBy($"side")
      }))
}
