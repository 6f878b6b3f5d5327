package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Hierarchical forecast reconciliation check (Hyndman et al. 2011,
  * bottom-up vs direct): seasonal-naive (same-weekday-mean) forecasts
  * trained on days 0–20 for the test week 21–27, produced at BOTH
  * levels of the hierarchy — per event type and directly at the total
  * — and compared per test day: the direct total, the bottom-up sum
  * of type forecasts, the incoherence between them, and each one's
  * error against the actual. Incoherent level forecasts are the
  * classic silent bug of per-team dashboards (the parts don't sum to
  * the headline); the reconciliation table is the fix's evidence.
  *
  * Determinism: daily series are cent-scaled BIGINT; each weekday
  * mean is an exact sum/count ratio; comparisons are fixed-order
  * doubles from exact sums, snapped; bottom-up sums fold in DECIMAL.
  * All snaps convert to DOLLAR scale first and use the 1e-6 grid:
  * the cent-scale means reach ~1e8 at sf0.1, and snapping those on
  * the 1e-9 grid runs x·1e9 past 2^53 where rounding is
  * engine-build-dependent — the r7 flapping red row.
  *
  * Scale: one daily hash aggregate (calendar-bounded), weekday-mean
  * aggregates over 21 rows/type, a 7-row join.
  */
object Reconcile {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ts_forecast_reconcile",
      Some(s"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS z
          FROM events GROUP BY 1, 2),
        d0 AS (SELECT MIN(day) AS d0 FROM daily),
        idx AS (
          SELECT event_type, day, z, day - d0.d0 AS di, (day - d0.d0) % 7 AS wd
          FROM daily CROSS JOIN d0),
        fc_type AS (
          SELECT event_type, wd,
                 SUM(z) * 1.0 / COUNT(*) AS f
          FROM idx WHERE di < 21 GROUP BY event_type, wd),
        tot_daily AS (
          SELECT day, di, wd, SUM(z) AS zt FROM idx
          GROUP BY day, di, wd),
        fc_total AS (
          SELECT wd, SUM(zt) * 1.0 / COUNT(*) AS f
          FROM tot_daily WHERE di < 21 GROUP BY wd),
        bu AS (
          SELECT wd, CAST(SUM(CAST(${det.sqlSnap6("f / 100.0")} AS DECIMAL(28,9)))
            AS DOUBLE) AS f_bu
          FROM fc_type GROUP BY wd),
        test AS (
          SELECT t.day, t.wd, t.zt, ft.f AS f_direct, bu.f_bu
          FROM tot_daily t
          JOIN fc_total ft ON ft.wd = t.wd
          JOIN bu ON bu.wd = t.wd
          WHERE t.di >= 21 AND t.di < 28)
        SELECT CAST(day AS VARCHAR) AS day,
               ${det.sqlSnap6("zt / 100.0")} AS actual,
               ${det.sqlSnap6("f_direct / 100.0")} AS direct,
               ${det.sqlSnap6("f_bu")} AS bottom_up,
               ${det.sqlSnap6("f_direct / 100.0 - f_bu")} AS incoherence,
               ${det.sqlSnap6("abs(zt - f_direct) / 100.0")} AS err_direct,
               ${det.sqlSnap6("abs(zt / 100.0 - f_bu)")} AS err_bottom_up
        FROM test
        ORDER BY day
      """.trim),
      (s, d) => {
        import s.implicits._
        val daily = events(s, d)
          .groupBy($"event_type", $"ts".cast("date").as("day"))
          .agg((sum($"value".cast(DecimalType(18, 2))) * 100)
            .cast("long").as("z"))
        val d0 = daily.agg(min($"day").as("d0"))
        val idx = daily.crossJoin(broadcast(d0))
          .select($"event_type", $"day", $"z",
            datediff($"day", $"d0").as("di"),
            (datediff($"day", $"d0") % 7).as("wd"))
        val fcType = idx.filter($"di" < 21)
          .groupBy($"event_type", $"wd".as("ft_wd"))
          .agg((sum($"z") * lit(1.0) / count(lit(1))).as("f"))
        val totDaily = idx.groupBy($"day", $"di", $"wd")
          .agg(sum($"z").as("zt"))
        val fcTotal = totDaily.filter($"di" < 21)
          .groupBy($"wd".as("t_wd"))
          .agg((sum($"zt") * lit(1.0) / count(lit(1))).as("f_direct"))
        val bu = fcType.groupBy($"ft_wd".as("b_wd"))
          .agg(sum(det.snap6($"f" / 100.0).cast(DecimalType(28, 9)))
            .cast("double").as("f_bu"))
        val test = totDaily.filter($"di" >= 21 && $"di" < 28)
          .join(broadcast(fcTotal), $"wd" === $"t_wd")
          .join(broadcast(bu), $"wd" === $"b_wd")
        test.select(date_format($"day", "yyyy-MM-dd").as("day"),
            det.snap6($"zt" / 100.0).as("actual"),
            det.snap6($"f_direct" / 100.0).as("direct"),
            det.snap6($"f_bu").as("bottom_up"),
            det.snap6($"f_direct" / 100.0 - $"f_bu").as("incoherence"),
            det.snap6(abs($"zt" - $"f_direct") / 100.0).as("err_direct"),
            det.snap6(abs($"zt" / 100.0 - $"f_bu")).as("err_bottom_up"))
          .orderBy($"day")
      }))
}
