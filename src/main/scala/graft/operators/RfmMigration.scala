package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** RFM segment migration matrix — the CRM follow-up to the static
  * ev_rfm snapshot: classify every user in the first and second half
  * of the observation window (R: active in the half's last 8 hours;
  * F: ≥33 events; M: ≥ $1,600 value — near-median cuts) and count the half1 → half2
  * segment transitions. The matrix's off-diagonal mass is churn-risk
  * and win-back targeting in one table; users absent from a half are
  * classified 'absent', so acquisition and churn appear as explicit
  * rows rather than survivors' bias.
  *
  * Determinism: all three axes are exact-integer predicates
  * (microsecond recency vs the half's max event time, counts,
  * cent-scaled sums); segments are strings.
  *
  * Scale: ONE (user, half) aggregate → a self-join keyed by user →
  * one transition count — mergeable throughout.
  */
object RfmMigration {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_rfm_migration",
      Some(s"""
        WITH bounds AS (
          SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS m FROM events),
        ev AS (
          SELECT user_id,
                 CASE WHEN epoch_us(ts) < m THEN 0 ELSE 1 END AS half,
                 epoch_us(ts) AS us,
                 CAST(value AS DECIMAL(18,2)) AS v
          FROM events CROSS JOIN bounds),
        hmax AS (SELECT half, MAX(us) AS hend FROM ev GROUP BY half),
        urfm AS (
          SELECT e.user_id, e.half,
                 CASE WHEN MAX(e.us) >= MAX(h.hend) - 28800000000 THEN 1 ELSE 0 END AS r,
                 CASE WHEN COUNT(*) >= 33 THEN 1 ELSE 0 END AS f,
                 CASE WHEN CAST(SUM(e.v) * 100 AS BIGINT) >= 160000 THEN 1 ELSE 0 END AS mflag
          FROM ev e JOIN hmax h ON h.half = e.half
          GROUP BY e.user_id, e.half),
        seg AS (
          SELECT user_id, half,
                 'R' || r || 'F' || f || 'M' || mflag AS segment
          FROM urfm),
        users AS (SELECT DISTINCT user_id FROM seg),
        pairs AS (
          SELECT u.user_id,
                 COALESCE(s1.segment, 'absent') AS seg1,
                 COALESCE(s2.segment, 'absent') AS seg2
          FROM users u
          LEFT JOIN seg s1 ON s1.user_id = u.user_id AND s1.half = 0
          LEFT JOIN seg s2 ON s2.user_id = u.user_id AND s2.half = 1)
        SELECT seg1, seg2, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM pairs
        GROUP BY seg1, seg2
        ORDER BY seg1, seg2
      """.trim),
      (s, d) => {
        import s.implicits._
        val bounds = events(s, d).agg(expr(
          "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("m"))
        val ev = events(s, d).crossJoin(broadcast(bounds))
          .select($"user_id",
            when(expr("unix_micros(ts)") < $"m", 0).otherwise(1).as("half"),
            expr("unix_micros(ts)").as("us"),
            $"value".cast(DecimalType(18, 2)).as("v"))
        val hmax = ev.groupBy($"half".as("h_half"))
          .agg(max($"us").as("hend"))
        val urfm = ev.join(broadcast(hmax), $"half" === $"h_half")
          .groupBy($"user_id", $"half")
          .agg(
            when(max($"us") >= max($"hend") - 28800000000L, 1)
              .otherwise(0).as("r"),
            when(count(lit(1)) >= 33, 1).otherwise(0).as("f"),
            when((sum($"v") * 100).cast("long") >= 160000L, 1)
              .otherwise(0).as("mflag"))
        val seg = urfm.select($"user_id", $"half",
          concat(lit("R"), $"r", lit("F"), $"f", lit("M"), $"mflag")
            .as("segment"))
        val users = seg.select($"user_id").distinct()
        val s1 = seg.filter($"half" === 0)
          .select($"user_id".as("u1"), $"segment".as("seg1v"))
        val s2 = seg.filter($"half" === 1)
          .select($"user_id".as("u2"), $"segment".as("seg2v"))
        users
          .join(s1, $"user_id" === $"u1", "left")
          .join(s2, $"user_id" === $"u2", "left")
          .select(coalesce($"seg1v", lit("absent")).as("seg1"),
            coalesce($"seg2v", lit("absent")).as("seg2"))
          .groupBy($"seg1", $"seg2")
          .agg(count(lit(1)).cast("long").as("n_users"))
          .orderBy($"seg1", $"seg2")
      }))
}
