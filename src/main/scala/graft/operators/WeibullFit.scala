package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Weibull churn-curve fit by the linearized (Weibull-plot) method:
  * user lifetime T = days between first and last event (+1); the
  * empirical survival S(t) at t = 1..14 days linearizes as
  * ln(−ln S(t)) = k·ln t − k·ln λ, and OLS over the valid points
  * gives shape k and scale λ. k < 1 means infant-mortality churn
  * (most loss is immediate — fix onboarding), k > 1 wear-out churn
  * (loss accumulates — fix long-run value): the parametric reading
  * ev_lifetable's raw curve can't give. Grid points with S = 0 or 1
  * are excluded by exact-integer predicates in both engines.
  *
  * Determinism: lifetimes and survival counts are exact integers;
  * each (ln t, ln(−ln S)) pair is snapped into DECIMAL sums; the OLS
  * closed form is one fixed-order double expression, snapped.
  *
  * Scale: one per-user aggregate, one 14-bucket survival count (via a
  * bounded literal grid), a ≤14-point fold.
  */
object WeibullFit {

  private val maxT = 14

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_weibull_fit",
      Some(s"""
        WITH u AS (
          SELECT user_id,
                 CAST(ts AS DATE) AS d
          FROM events),
        lt AS (
          SELECT user_id,
                 (MAX(d) - MIN(d)) + 1 AS t
          FROM u GROUP BY user_id),
        n AS (SELECT COUNT(*) AS n FROM lt),
        grid AS (SELECT UNNEST(range(1, ${maxT + 1})) AS t),
        surv AS (
          SELECT g.t, COUNT(l.user_id) AS alive, MAX(n.n) AS n
          FROM grid g
          LEFT JOIN lt l ON l.t > g.t
          CROSS JOIN n
          GROUP BY g.t),
        pts AS (
          SELECT t, alive, n,
                 CAST(${det.sqlSnap9("ln(CAST(t AS DOUBLE))")}
                   AS DECIMAL(28,12)) AS lx,
                 CAST(${det.sqlSnap9(
          "ln(-ln(alive * 1.0 / n))")} AS DECIMAL(28,12)) AS ly
          FROM surv WHERE alive > 0 AND alive < n),
        mo AS (
          SELECT COUNT(*) AS k,
                 CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(${det.sqlSnap9(
          "CAST(lx AS DOUBLE) * CAST(ly AS DOUBLE)")} AS DECIMAL(28,12)))
                   AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(${det.sqlSnap9(
          "CAST(lx AS DOUBLE) * CAST(lx AS DOUBLE)")} AS DECIMAL(28,12)))
                   AS DOUBLE) AS sxx
          FROM pts)
        SELECT CAST(k AS BIGINT) AS n_points,
               ${det.sqlSnap9(
          "(sxy - sx * sy / k) / (sxx - sx * sx / k)")} AS shape_k,
               ${det.sqlSnap9(
          "exp(-(sy / k - (sxy - sx * sy / k) / (sxx - sx * sx / k)" +
            " * (sx / k)) / ((sxy - sx * sy / k) / (sxx - sx * sx / k)))")}
                 AS scale_lambda,
               ${det.sqlSnap9(
          "(sxy - sx * sy / k) / (sxx - sx * sx / k)")} > 1.0 AS wear_out
        FROM mo
      """.trim),
      (s, d) => {
        import s.implicits._
        val lt = events(s, d)
          .select($"user_id", $"ts".cast("date").as("d"))
          .groupBy($"user_id")
          .agg((datediff(max($"d"), min($"d")) + 1).cast("long").as("t"))
        val n = lt.agg(count(lit(1)).as("n"))
        val grid = s.range(1, maxT + 1).select($"id".as("g_t"))
        val surv = grid
          .join(lt, $"t" > $"g_t", "left")
          .crossJoin(broadcast(n))
          .groupBy($"g_t")
          .agg(count($"user_id").as("alive"), max($"n").as("n"))
        val pts = surv.filter($"alive" > 0 && $"alive" < $"n")
          .select(
            det.snap9(log($"g_t".cast("double")))
              .cast(org.apache.spark.sql.types.DecimalType(28, 12)).as("lx"),
            det.snap9(log(-log($"alive" * lit(1.0) / $"n")))
              .cast(org.apache.spark.sql.types.DecimalType(28, 12)).as("ly"))
        val mo = pts.agg(count(lit(1)).as("k"),
          sum($"lx").cast("double").as("sx"),
          sum($"ly").cast("double").as("sy"),
          sum(det.snap9($"lx".cast("double") * $"ly".cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
            .cast("double").as("sxy"),
          sum(det.snap9($"lx".cast("double") * $"lx".cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(28, 12)))
            .cast("double").as("sxx"))
        val shape = det.snap9(($"sxy" - $"sx" * $"sy" / $"k")
          / ($"sxx" - $"sx" * $"sx" / $"k"))
        mo.select($"k".cast("long").as("n_points"),
          shape.as("shape_k"),
          det.snap9(exp(-($"sy" / $"k"
            - ($"sxy" - $"sx" * $"sy" / $"k")
              / ($"sxx" - $"sx" * $"sx" / $"k") * ($"sx" / $"k"))
            / (($"sxy" - $"sx" * $"sy" / $"k")
              / ($"sxx" - $"sx" * $"sx" / $"k")))).as("scale_lambda"),
          (shape > lit(1.0)).as("wear_out"))
      }))
}
