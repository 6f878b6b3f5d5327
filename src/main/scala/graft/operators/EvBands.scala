package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics staples over the events log: daily exact
  * percentile bands and the session-scoped ORDERED funnel.
  *
  * ev_value_bands: per-day P50/P90/max of event value by exact rank
  * selection inside day partitions — the day key is what a time-
  * partitioned table shards by, so each partition's sort is local.
  *
  * ev_session_funnel: ev_funnel counts users who EVER did each stage;
  * this one counts 30-minute sessions that progress view → click →
  * purchase IN ORDER (by event sequence within the session) — the
  * difference between lifetime reach and in-session conversion. The
  * sessionization is ev_session_window's gap construction verbatim;
  * stage progression is pure integer MINs over event ids (no floats).
  */
object EvBands {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_value_bands",
      Some("""
        WITH d AS (
          SELECT strftime(ts, '%Y-%m-%d') AS day, value, event_id FROM events),
        r AS (
          SELECT day, value,
                 row_number() OVER (PARTITION BY day ORDER BY value, event_id) AS rk,
                 COUNT(*) OVER (PARTITION BY day) AS n
          FROM d)
        SELECT day,
               CAST(MAX(n) AS BIGINT) AS n_events,
               MIN(CASE WHEN rk = (n + 1) // 2 THEN value END) AS p50,
               MIN(CASE WHEN rk = (9 * n + 9) // 10 THEN value END) AS p90,
               MAX(value) AS max_value
        FROM r
        GROUP BY day
        ORDER BY day
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"day")
        events(s, d)
          .select(date_format($"ts", "yyyy-MM-dd").as("day"), $"value", $"event_id")
          .withColumn("rk", row_number().over(w.orderBy($"value", $"event_id")))
          .withColumn("n", count(lit(1)).over(w))
          .groupBy($"day")
          .agg(max($"n").cast("long").as("n_events"),
            min(when($"rk" === floor(($"n" + 1) / 2).cast("long"), $"value")).as("p50"),
            min(when($"rk" === floor(($"n" * 9 + 9) / 10).cast("long"), $"value")).as("p90"),
            max($"value").as("max_value"))
          .orderBy($"day")
      }),

    QueryDef(
      "ev_session_funnel",
      Some("""
        WITH ordered AS (
          SELECT user_id, event_id, event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) AS t,
                 LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY event_id) AS prev_t
          FROM events),
        sessions AS (
          SELECT user_id, event_id, event_type,
                 CAST(SUM(CASE WHEN prev_t IS NULL OR t - prev_t > 1800 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          FROM ordered),
        s1 AS (
          SELECT user_id, session_no,
                 MIN(CASE WHEN event_type = 'view' THEN event_id END) AS vid
          FROM sessions GROUP BY user_id, session_no),
        s2 AS (
          SELECT e.user_id, e.session_no,
                 MIN(CASE WHEN e.event_type = 'click' AND e.event_id > x.vid
                          THEN e.event_id END) AS cid
          FROM sessions e JOIN s1 x
            ON x.user_id = e.user_id AND x.session_no = e.session_no
          WHERE x.vid IS NOT NULL
          GROUP BY e.user_id, e.session_no),
        s3 AS (
          SELECT e.user_id, e.session_no,
                 MIN(CASE WHEN e.event_type = 'purchase' AND e.event_id > x.cid
                          THEN e.event_id END) AS pid
          FROM sessions e JOIN s2 x
            ON x.user_id = e.user_id AND x.session_no = e.session_no
          WHERE x.cid IS NOT NULL
          GROUP BY e.user_id, e.session_no)
        SELECT '1_view' AS stage,
               CAST((SELECT COUNT(*) FROM s1 WHERE vid IS NOT NULL) AS BIGINT) AS n_sessions
        UNION ALL
        SELECT '2_click',
               CAST((SELECT COUNT(*) FROM s2 WHERE cid IS NOT NULL) AS BIGINT)
        UNION ALL
        SELECT '3_purchase',
               CAST((SELECT COUNT(*) FROM s3 WHERE pid IS NOT NULL) AS BIGINT)
        ORDER BY stage
      """.trim),
      (s, d) => {
        import s.implicits._
        val uw = Window.partitionBy($"user_id").orderBy($"event_id")
        val t = floor(unix_timestamp($"ts")).cast("long")
        val sessions = events(s, d)
          .select($"user_id", $"event_id", $"event_type", t.as("t"))
          .withColumn("prev_t", lag($"t", 1).over(uw))
          .withColumn("session_no",
            sum(when($"prev_t".isNull || $"t" - $"prev_t" > 1800, 1).otherwise(0))
              .over(uw.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("long"))
          .select($"user_id", $"event_id", $"event_type", $"session_no")
          .persist()
        val s1 = sessions.groupBy($"user_id", $"session_no")
          .agg(min(when($"event_type" === "view", $"event_id")).as("vid"))
        val s2 = sessions
          .join(s1.filter($"vid".isNotNull), Seq("user_id", "session_no"))
          .groupBy($"user_id", $"session_no")
          .agg(min(when($"event_type" === "click" && $"event_id" > $"vid",
            $"event_id")).as("cid"))
        val s3 = sessions
          .join(s2.filter($"cid".isNotNull), Seq("user_id", "session_no"))
          .groupBy($"user_id", $"session_no")
          .agg(min(when($"event_type" === "purchase" && $"event_id" > $"cid",
            $"event_id")).as("pid"))
        val c1 = s1.filter($"vid".isNotNull).agg(count(lit(1)).as("n"))
          .select(lit("1_view").as("stage"), $"n".as("n_sessions"))
        val c2 = s2.filter($"cid".isNotNull).agg(count(lit(1)).as("n"))
          .select(lit("2_click").as("stage"), $"n".as("n_sessions"))
        val c3 = s3.filter($"pid".isNotNull).agg(count(lit(1)).as("n"))
          .select(lit("3_purchase").as("stage"), $"n".as("n_sessions"))
        c1.unionByName(c2).unionByName(c3).orderBy($"stage")
      }))
}
