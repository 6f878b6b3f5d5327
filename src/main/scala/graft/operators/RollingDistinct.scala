package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Rolling 7-day distinct active users — the WAU curve. Distinct
  * counts don't decompose over sliding windows (a user active on two
  * days of the window must count once), so the exact form fans each
  * event out to the ≤7 window-days it participates in and re-counts
  * distinct per day. The fan-out is an EXPLODE of
  * `sequence(edate, edate+6)` — a row-local 7× multiply — followed by
  * ONE hash equi-join against the (broadcast) day grid to drop
  * window-days with no anchor events, then one hash aggregate per
  * day. No range predicate ever reaches a join: the naive
  * day-grid-BETWEEN-events formulation plans a
  * BroadcastNestedLoopJoin that evaluates |days| predicates per event
  * row — |days|×|events| comparisons where the fan-out is
  * inherently 7×|events| — and at years of history over 100 TB that
  * nested loop is the bottleneck. (The oracle runs the direct range
  * self-join: at its scale that is its privilege; the Spark side must
  * never — same rule as [[IntervalJoin]].) At 100 TB the exact
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
        // 7× row-local fan-out, then an EQUI-join (broadcast hash, not
        // nested-loop) to keep only days that exist in the grid.
        ev.withColumn("day",
            explode(sequence($"edate", date_add($"edate", 6))))
          .join(broadcast(days), Seq("day"), "left_semi")
          .groupBy($"day")
          .agg(count_distinct($"user_id").as("wau"), count(lit(1)).as("n_events"))
          .select($"day", $"wau".cast("long").as("wau"),
            $"n_events".cast("long").as("n_events"))
          .orderBy($"day")
      }),

    // The production path at 100 TB: build ONE HLL sketch per day
    // (each day's events scanned once), then merge 7 sketches per
    // window position — fan-out is |window| sketch merges per day
    // instead of |window| × events rows. Both the sketch merge and
    // the exact audit arm use the same explode-to-window-day +
    // equi-join shape as ev_rolling_distinct (no nested-loop range
    // join anywhere). The estimate can't be mirrored in SQL, so the
    // oracle carries the exact count and TRUE for the 5 % accuracy
    // flag (the sk_hll_merge proof pattern): the row hash-matches iff
    // the sketch estimate really is in bounds.
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
        val est = daily
          .withColumn("day",
            explode(sequence($"edate", date_add($"edate", 6))))
          .join(broadcast(days), Seq("day"), "left_semi")
          .groupBy($"day")
          .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
        val exact = ev
          .withColumn("xday",
            explode(sequence($"edate", date_add($"edate", 6))))
          .join(broadcast(days.select($"day".as("xday"))), Seq("xday"), "left_semi")
          .groupBy($"xday")
          .agg(count_distinct($"user_id").as("wau_exact"))
        est.join(exact, $"day" === $"xday")
          .select($"day", $"wau_exact".cast("long").as("wau_exact"),
            (abs($"est" - $"wau_exact") <= $"wau_exact" * 0.05).as("est_in_5pct"))
          .orderBy($"day")
      }))
}
