package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Rolling 7-day distinct active users — the WAU curve. Distinct
  * counts don't decompose over sliding windows (a user active on two
  * days of the window must count once), so the exact form joins the
  * bounded day grid against the events whose date falls in each day's
  * trailing week and re-counts distinct per window: the fan-out is
  * |window| × events, the day grid rides in by broadcast, and the
  * count-distinct is one hash aggregate per day. At 100 TB the exact
  * fan-out is the audit variant; the production path merges per-day
  * HLL sketches across the window ([[Sketches]]' sk_hll_merge proves
  * the re-aggregation property this relies on), cutting the fan-out to
  * |window| sketch merges per day.
  */
object RollingDistinct {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_rolling_distinct",
      Some("""
        WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        w AS (
          SELECT d.day, e.user_id, e.event_id
          FROM days d JOIN events e
            ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day)
        SELECT day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM w GROUP BY day ORDER BY day
      """.trim),
      (s, d) => {
        import s.implicits._
        val ev = events(s, d).select($"ts".cast("date").as("edate"),
          $"user_id", $"event_id")
        val days = ev.select($"edate".as("day")).distinct()
        broadcast(days)
          .join(ev, $"edate".between(date_sub($"day", 6), $"day"))
          .groupBy($"day")
          .agg(count_distinct($"user_id").as("wau"), count(lit(1)).as("n_events"))
          .select($"day", $"wau".cast("long").as("wau"),
            $"n_events".cast("long").as("n_events"))
          .orderBy($"day")
      }))
}
