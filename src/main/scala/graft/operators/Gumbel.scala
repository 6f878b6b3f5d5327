package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Extreme-value (Gumbel) fit of daily peak load by block maxima
  * (Gumbel 1958; the capacity-planning classic): block = day, maximum
  * = the day's busiest hour's event count, Gumbel parameters by
  * method of moments (β = s·√6/π, μ = x̄ − γβ with Euler–Mascheroni
  * γ = 0.5772156649), and the 30/100/365-day return levels
  * μ − β·ln(−ln(1 − 1/T)) — the "what peak do we size for" numbers
  * that mean+3σ systematically underestimates because maxima are NOT
  * normal.
  *
  * Determinism: block maxima are exact integers; moments are
  * HUGEINT/DECIMAL sums; the parameter and return-level expressions
  * are fixed-order doubles with quoted γ/√6/π literals, snapped.
  *
  * Scale: one (day, hour) aggregate, one per-day max, a 30-row moment
  * fold, a 3-row literal horizon join.
  */
object Gumbel {

  private val gamma = "0.5772156649"
  private val sqrt6OverPi = "0.7796968012336761" // sqrt(6)/pi literal
  private val horizons = Seq(30, 100, 365)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ts_gumbel_maxima",
      Some(s"""
        WITH hourly AS (
          SELECT CAST(ts AS DATE) AS day,
                 (epoch_us(ts) // 3600000000) % 24 AS hr,
                 COUNT(*) AS c
          FROM events GROUP BY 1, 2),
        dmax AS (
          SELECT day, MAX(c) AS m FROM hourly GROUP BY day),
        mo AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(m AS HUGEINT)) AS s1,
                 SUM(CAST(m AS HUGEINT) * m) AS s2
          FROM dmax),
        fit AS (
          SELECT n,
                 CAST(s1 AS DOUBLE) / n AS mean,
                 sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                   / (n - 1.0)) AS sd
          FROM mo),
        params AS (
          SELECT n, mean, sd,
                 sd * CAST($sqrt6OverPi AS DOUBLE) AS beta,
                 mean - CAST($gamma AS DOUBLE)
                   * (sd * CAST($sqrt6OverPi AS DOUBLE)) AS mu
          FROM fit),
        h AS (SELECT UNNEST([${horizons.mkString(", ")}]) AS t)
        SELECT CAST(h.t AS BIGINT) AS horizon_days,
               CAST(p.n AS BIGINT) AS n_blocks,
               ${det.sqlSnap9("p.mu")} AS mu,
               ${det.sqlSnap9("p.beta")} AS beta,
               ${det.sqlSnap9(
          "p.mu - p.beta * ln(-ln(1.0 - 1.0 / h.t))")} AS return_level
        FROM h CROSS JOIN params p
        ORDER BY horizon_days
      """.trim),
      (s, d) => {
        import s.implicits._
        val hourly = events(s, d)
          .groupBy($"ts".cast("date").as("day"),
            (expr("unix_micros(ts) div 3600000000") % 24).as("hr"))
          .agg(count(lit(1)).as("c"))
        val dmax = hourly.groupBy($"day").agg(max($"c").as("m"))
        val hug = $"m".cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val mo = dmax.agg(count(lit(1)).as("n"),
          sum(hug).as("s1"), sum(hug * $"m").as("s2"))
        val fit = mo.select($"n",
          ($"s1".cast("double") / $"n").as("mean"),
          sqrt(($"s2".cast("double") - $"s1".cast("double") * $"s1" / $"n")
            / ($"n" - lit(1.0))).as("sd"))
        val params = fit.select($"n", $"mean", $"sd",
          ($"sd" * lit(sqrt6OverPi.toDouble)).as("beta"),
          ($"mean" - lit(gamma.toDouble)
            * ($"sd" * lit(sqrt6OverPi.toDouble))).as("mu"))
        val h = horizons.toDF("t")
        h.crossJoin(broadcast(params))
          .select($"t".cast("long").as("horizon_days"),
            $"n".cast("long").as("n_blocks"),
            det.snap9($"mu").as("mu"), det.snap9($"beta").as("beta"),
            det.snap9($"mu" - $"beta"
              * log(-log(lit(1.0) - lit(1.0) / $"t"))).as("return_level"))
          .orderBy($"horizon_days")
      }))
}
