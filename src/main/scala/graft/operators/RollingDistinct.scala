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
      }),

    // The production path at 100 TB: build ONE HLL sketch per day
    // (each day's events scanned once), then merge 7 sketches per
    // window position — fan-out is |window| sketch merges per day
    // instead of |window| × events rows. The estimate can't be
    // mirrored in SQL, so the oracle carries the exact count and TRUE
    // for the 5 % accuracy flag (the sk_hll_merge proof pattern): the
    // row hash-matches iff the sketch estimate really is in bounds.
    QueryDef(
      "ev_rolling_distinct_hll",
      Some("""
        WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        w AS (
          SELECT d.day, e.user_id
          FROM days d JOIN events e
            ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day)
        SELECT day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_exact,
               TRUE AS est_in_5pct
        FROM w GROUP BY day ORDER BY day
      """.trim),
      (s, d) => {
        import s.implicits._
        val ev = events(s, d).select($"ts".cast("date").as("edate"), $"user_id")
        val daily = ev.groupBy($"edate").agg(hll_sketch_agg($"user_id").as("sk"))
        val days = daily.select($"edate".as("day")).distinct()
        val est = broadcast(days)
          .join(daily, $"edate".between(date_sub($"day", 6), $"day"))
          .groupBy($"day")
          .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
        val exact = broadcast(days.select($"day".as("xday")))
          .join(ev, $"edate".between(date_sub($"xday", 6), $"xday"))
          .groupBy($"xday")
          .agg(count_distinct($"user_id").as("wau_exact"))
        est.join(exact, $"day" === $"xday")
          .select($"day", $"wau_exact".cast("long").as("wau_exact"),
            (abs($"est" - $"wau_exact") <= $"wau_exact" * 0.05).as("est_in_5pct"))
          .orderBy($"day")
      }))
}
