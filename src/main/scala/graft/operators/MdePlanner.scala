package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Minimum-detectable-effect planning table — the experiment-sizing
  * arithmetic every platform runs BEFORE launching a test: given the
  * observed per-user revenue variance and daily active-user rate,
  * what absolute lift is detectable at α = 0.05 (two-sided) / 80%
  * power for runtimes of 7, 14, 28 days?
  * MDE = (z_{α/2} + z_β)·√(2σ²/n), n = users-per-arm at that horizon.
  * Quoted quantiles: 1.96 and 0.8416.
  *
  * Determinism: per-user revenue moments are cent-scaled
  * HUGEINT/DECIMAL sums; the rate, σ², and each MDE row are
  * fixed-order double expressions, snapped.
  *
  * Scale: one per-user aggregate, one 1-row moment reduction, a
  * 3-row literal horizon join — mergeable counters however large the
  * event volume.
  */
object MdePlanner {

  private val horizons = Seq(7, 14, 28)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_mde_planning",
      Some(s"""
        WITH u AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
                   * 100 AS BIGINT) AS rev
          FROM events GROUP BY user_id),
        days AS (
          SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days FROM events),
        mo AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(rev AS HUGEINT)) AS s1,
                 SUM(CAST(rev AS HUGEINT) * rev) AS s2
          FROM u),
        base AS (
          SELECT mo.n, days.n_days,
                 (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                   / (n - 1.0) / 10000.0 AS var_rev,
                 CAST(mo.n AS DOUBLE) / days.n_days AS users_per_day
          FROM mo CROSS JOIN days),
        h AS (SELECT UNNEST([${horizons.mkString(", ")}]) AS horizon_days)
        SELECT CAST(h.horizon_days AS BIGINT) AS horizon_days,
               CAST(floor(b.users_per_day * h.horizon_days / 2) AS BIGINT)
                 AS n_per_arm,
               ${det.sqlSnap9("sqrt(b.var_rev)")} AS sigma,
               ${det.sqlSnap9(
          "(1.96 + 0.8416) * sqrt(2.0 * b.var_rev" +
            " / floor(b.users_per_day * h.horizon_days / 2))")} AS mde
        FROM h CROSS JOIN base b
        ORDER BY horizon_days
      """.trim),
      (s, d) => {
        import s.implicits._
        val u = events(s, d)
          .groupBy($"user_id")
          .agg((sum(when($"event_type" === "purchase",
            $"value".cast(DecimalType(18, 2)))
            .otherwise(lit(0).cast(DecimalType(18, 2)))) * 100)
            .cast("long").as("rev"))
        val days = events(s, d)
          .agg(countDistinct($"ts".cast("date")).as("n_days"))
        val hug = $"rev".cast(DecimalType(38, 0))
        val mo = u.agg(count(lit(1)).as("n"),
          sum(hug).as("s1"), sum(hug * $"rev").as("s2"))
        val base = mo.crossJoin(days)
          .select($"n", $"n_days",
            (($"s2".cast("double") - $"s1".cast("double") * $"s1" / $"n")
              / ($"n" - lit(1.0)) / 10000.0).as("var_rev"),
            ($"n".cast("double") / $"n_days").as("users_per_day"))
        val h = horizons.toDF("horizon_days")
        h.crossJoin(base)
          .select($"horizon_days".cast("long").as("horizon_days"),
            floor($"users_per_day" * $"horizon_days" / 2)
              .cast("long").as("n_per_arm"),
            det.snap9(sqrt($"var_rev")).as("sigma"),
            det.snap9(lit(1.96 + 0.8416) * sqrt(lit(2.0) * $"var_rev"
              / floor($"users_per_day" * $"horizon_days" / 2))).as("mde"))
          .orderBy($"horizon_days")
      }))
}
