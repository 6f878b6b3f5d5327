package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily-activity streaks by gaps-and-islands: per user, maximal runs
  * of CONSECUTIVE active days (island id = day − dense day-rank, the
  * classic trick), then the engagement summary product teams track —
  * per streak-length bucket, how many users peak there, plus each
  * bucket's mean total activity. Streak length is the habit metric
  * that daily-active counts hide: the same DAU can be one cohort of
  * 30-day streakers or thirty cohorts of one-day visitors.
  *
  * Determinism: pure integer date arithmetic and counts; the mean is
  * an exact-int ratio.
  *
  * Scale: one (user, day) distinct aggregate, ONE keyed-by-user
  * window (each user's days, never global), two hash aggregates.
  */
object Streaks {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_activity_streaks",
      Some("""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        isl AS (
          SELECT user_id, day,
                 day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY day) AS INTEGER) AS island
          FROM ud),
        streaks AS (
          SELECT user_id, island, COUNT(*) AS len
          FROM isl GROUP BY user_id, island),
        longest AS (
          SELECT user_id, MAX(len) AS max_streak, SUM(len) AS active_days
          FROM streaks GROUP BY user_id)
        SELECT CAST(max_streak AS BIGINT) AS streak_days,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(active_days) AS BIGINT) AS total_active_days,
               SUM(active_days) * 1.0 / COUNT(*) AS mean_active_days
        FROM longest
        GROUP BY max_streak
        ORDER BY streak_days
      """.trim),
      (s, d) => {
        import s.implicits._
        val ud = events(s, d)
          .select($"user_id", $"ts".cast("date").as("day")).distinct()
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val isl2 = ud.withColumn("rn", row_number().over(w))
          .withColumn("island", date_sub($"day", $"rn"))
        val streaks = isl2.groupBy($"user_id", $"island")
          .agg(count(lit(1)).as("len"))
        val longest = streaks.groupBy($"user_id")
          .agg(max($"len").as("max_streak"), sum($"len").as("active_days"))
        longest.groupBy($"max_streak")
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum($"active_days").cast("long").as("total_active_days"),
            (sum($"active_days") * lit(1.0) / count(lit(1)))
              .as("mean_active_days"))
          .select($"max_streak".cast("long").as("streak_days"),
            $"n_users", $"total_active_days", $"mean_active_days")
          .orderBy($"streak_days")
      }))
}
