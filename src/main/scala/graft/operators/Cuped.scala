package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** CUPED variance reduction for the A/B readout ([[Experiments]]) —
  * the standard experimentation-platform move: regress each user's
  * in-experiment metric on their PRE-experiment covariate and compare
  * variants on the residualized metric, cutting the variance by the
  * squared correlation ρ² without touching the treatment contrast
  * (Deng et al., WSDM'13).
  *
  * Metric y = per-user purchase value in the back half of the event
  * window; covariate x = the same user's purchase value in the front
  * half; θ = cov(x,y)/var(x) pooled across arms; adjusted mean per
  * arm = ȳ_v − θ·(x̄_v − x̄). All moments are DECIMAL sums (per-user
  * sums exact, per-user cross products one IEEE multiply each), so θ,
  * ρ², and the adjusted means are fixed-order double expressions over
  * partitioning-independent inputs — hash-comparable, and the whole
  * query is two hash aggregates over users plus a broadcast of the
  * one-row global-moment table regardless of user count.
  */
object Cuped {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_cuped",
      Some("""
        WITH p AS (
          SELECT user_id, user_id % 2 AS variant,
                 CAST(coalesce(SUM(CASE WHEN event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
                       THEN CAST(value AS DECIMAL(28,10)) END), 0) AS DOUBLE) AS x,
                 CAST(coalesce(SUM(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'
                       THEN CAST(value AS DECIMAL(28,10)) END), 0) AS DOUBLE) AS y
          FROM events GROUP BY user_id),
        g AS (
          SELECT COUNT(*) AS n,
                 CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(x * x AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(x * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(y * y AS DECIMAL(38,10))) AS DOUBLE) AS syy
          FROM p),
        v AS (
          SELECT variant, COUNT(*) AS nv,
                 CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) AS sxv,
                 CAST(SUM(CAST(y AS DECIMAL(38,10))) AS DOUBLE) AS syv
          FROM p GROUP BY variant)
        SELECT CAST(variant AS BIGINT) AS variant,
               CAST(nv AS BIGINT) AS n_users,
               syv / nv AS mean_metric,
               syv / nv - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (sxv / nv - sx / n) AS mean_adjusted,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
               ((sxy - sx * sy / n) * (sxy - sx * sy / n))
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS var_reduction
        FROM v CROSS JOIN g
        ORDER BY variant
      """.trim),
      (s, d) => {
        import s.implicits._
        val cut = lit("2024-01-16").cast("timestamp")
        val dv = $"value".cast(DecimalType(28, 10))
        val zero = lit(0).cast(DecimalType(38, 10))
        val p = events(s, d)
          .groupBy($"user_id")
          .agg(
            coalesce(sum(when($"event_type" === "purchase" && $"ts" < cut, dv)), zero)
              .cast("double").as("x"),
            coalesce(sum(when($"event_type" === "purchase" && $"ts" >= cut, dv)), zero)
              .cast("double").as("y"))
          .withColumn("variant", $"user_id" % 2)
        val g = p.agg(
          count(lit(1)).as("n"),
          sum($"x".cast(DecimalType(38, 10))).cast("double").as("sx"),
          sum($"y".cast(DecimalType(38, 10))).cast("double").as("sy"),
          sum(($"x" * $"x").cast(DecimalType(38, 10))).cast("double").as("sxx"),
          sum(($"x" * $"y").cast(DecimalType(38, 10))).cast("double").as("sxy"),
          sum(($"y" * $"y").cast(DecimalType(38, 10))).cast("double").as("syy"))
        val v = p.groupBy($"variant").agg(
          count(lit(1)).as("nv"),
          sum($"x".cast(DecimalType(38, 10))).cast("double").as("sxv"),
          sum($"y".cast(DecimalType(38, 10))).cast("double").as("syv"))
        val covxy = $"sxy" - $"sx" * $"sy" / $"n"
        val varx = $"sxx" - $"sx" * $"sx" / $"n"
        val vary = $"syy" - $"sy" * $"sy" / $"n"
        val theta = covxy / varx
        v.crossJoin(broadcast(g))
          .select($"variant".cast("long").as("variant"),
            $"nv".cast("long").as("n_users"),
            ($"syv" / $"nv").as("mean_metric"),
            ($"syv" / $"nv" - theta * ($"sxv" / $"nv" - $"sx" / $"n")).as("mean_adjusted"),
            theta.as("theta"),
            ((covxy * covxy) / (varx * vary)).as("var_reduction"))
          .orderBy($"variant")
      }))
}
