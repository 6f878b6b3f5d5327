package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build from an event
  * stream — the warehouse-engineering staple: collapse each user's
  * event-type sequence into change intervals [valid_from, valid_to)
  * with a version number and an is_current flag on the open interval.
  * (In a real dimension the tracked attribute is a profile field; the
  * event type stands in for it here, same mechanics.)
  *
  * Dataflow: one lag window detects change points (attribute differs
  * from the previous row under the (ts, event_id) total order — the
  * id breaks timestamp ties identically in both engines), a second
  * window numbers the surviving change rows and closes each interval
  * with the next one's start. Both windows are keyed by user_id —
  * two keyed sorts over one hash exchange, no data-sized global sort
  * until the presentation ORDER BY. State per user is one row; the
  * output is the change-point set, corpus-sublinear for any sticky
  * attribute.
  */
object Scd2 {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_scd2_intervals",
      Some("""
        WITH o AS (
          SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        chg AS (
          SELECT user_id, event_type, ts,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
          FROM o WHERE prev IS NULL OR prev <> event_type)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(version AS BIGINT) AS version,
               event_type AS attr,
               ts AS valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM chg
        ORDER BY user_id, version
      """.trim),
      (s, d) => {
        import s.implicits._
        val wAll = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val chgRows = events(s, d)
          .select($"user_id", $"event_type", $"ts", $"event_id")
          .withColumn("prev", lag($"event_type", 1).over(wAll))
          .filter($"prev".isNull || $"prev" =!= $"event_type")
        val wChg = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        chgRows
          .withColumn("version", row_number().over(wChg))
          .withColumn("valid_to", lead($"ts", 1).over(wChg))
          .select($"user_id".cast("long").as("user_id"),
            $"version".cast("long").as("version"),
            $"event_type".as("attr"),
            $"ts".as("valid_from"), $"valid_to",
            $"valid_to".isNull.as("is_current"))
          .orderBy($"user_id", $"version")
      }))
}
