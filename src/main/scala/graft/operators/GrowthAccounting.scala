package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Growth accounting (the Social Capital / a16z WAU decomposition):
  * per week, active users split into NEW (first week ever), RETAINED
  * (active last week too), and RESURRECTED (active before, but not
  * last week); CHURNED is last week's actives who vanished. The
  * identity WAU_t = new + retained + resurrected and
  * WAU_t − WAU_{t−1} = new + resurrected − churned makes growth
  * diagnosable: the same flat WAU is healthy (low churn) or a leaky
  * bucket (high churn + high resurrection) — the first dashboard any
  * growth team builds.
  *
  * Determinism: pure set algebra on (user, week) integers.
  *
  * Scale: one (user, week) distinct aggregate, ONE keyed-by-user
  * window for first-seen/previous-week, one week-level count — no
  * week-over-week self-join of the activity table.
  */
object GrowthAccounting {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_growth_accounting",
      Some("""
        WITH uw AS (
          SELECT DISTINCT user_id,
                 (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                   // 604800000000 AS wk
          FROM events),
        marked AS (
          SELECT user_id, wk,
                 MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
                 lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
          FROM uw),
        cls AS (
          SELECT wk,
                 SUM(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS new_u,
                 SUM(CASE WHEN wk <> first_wk AND prev_wk = wk - 1
                     THEN 1 ELSE 0 END) AS retained_u,
                 SUM(CASE WHEN wk <> first_wk
                          AND (prev_wk IS NULL OR prev_wk < wk - 1)
                     THEN 1 ELSE 0 END) AS resurrected_u,
                 COUNT(*) AS wau
          FROM marked GROUP BY wk),
        churn AS (
          -- churned into week wk+1: active in wk with no activity in wk+1
          SELECT m.wk + 1 AS wk, COUNT(*) AS churned_u
          FROM marked m
          LEFT JOIN uw nxt ON nxt.user_id = m.user_id AND nxt.wk = m.wk + 1
          WHERE nxt.user_id IS NULL
          GROUP BY m.wk + 1)
        SELECT CAST(c.wk AS BIGINT) AS week,
               CAST(c.wau AS BIGINT) AS wau,
               CAST(c.new_u AS BIGINT) AS new_users,
               CAST(c.retained_u AS BIGINT) AS retained,
               CAST(c.resurrected_u AS BIGINT) AS resurrected,
               CAST(COALESCE(ch.churned_u, 0) AS BIGINT) AS churned
        FROM cls c LEFT JOIN churn ch ON ch.wk = c.wk
        ORDER BY week
      """.trim),
      (s, d) => {
        import s.implicits._
        val uw = events(s, d)
          .select($"user_id",
            expr("(unix_micros(ts) - 1704067200000000) DIV 604800000000")
              .as("wk"))
          .distinct()
        val pw = Window.partitionBy($"user_id")
        val marked = uw.select($"user_id", $"wk",
          min($"wk").over(pw).as("first_wk"),
          lag($"wk", 1).over(pw.orderBy($"wk")).as("prev_wk"))
        val cls = marked.groupBy($"wk")
          .agg(
            sum(when($"wk" === $"first_wk", 1).otherwise(0)).as("new_u"),
            sum(when($"wk" =!= $"first_wk" && $"prev_wk" === $"wk" - 1, 1)
              .otherwise(0)).as("retained_u"),
            sum(when($"wk" =!= $"first_wk"
              && ($"prev_wk".isNull || $"prev_wk" < $"wk" - 1), 1)
              .otherwise(0)).as("resurrected_u"),
            count(lit(1)).as("wau"))
        val churn = marked.as("m")
          .join(uw.select($"user_id".as("n_uid"), $"wk".as("n_wk")),
            $"n_uid" === $"user_id" && $"n_wk" === $"wk" + 1, "left_anti")
          .groupBy(($"wk" + 1).as("c_wk"))
          .agg(count(lit(1)).as("churned_u"))
        cls.join(churn, $"wk" === $"c_wk", "left")
          .select($"wk".cast("long").as("week"),
            $"wau".cast("long").as("wau"),
            $"new_u".cast("long").as("new_users"),
            $"retained_u".cast("long").as("retained"),
            $"resurrected_u".cast("long").as("resurrected"),
            coalesce($"churned_u", lit(0L)).cast("long").as("churned"))
          .orderBy($"week")
      }))
}
