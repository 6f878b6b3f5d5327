package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Sample-ratio-mismatch gate for the ev_ab_test experiment — the
  * first check every experimentation platform runs before reading a
  * metric: does the realized arm split match the configured 50/50?
  * A mismatch (|z| > 3.29, two-sided p < 0.001 — the conventional SRM
  * alarm threshold) means the assignment or logging is broken and the
  * experiment readout is void, however significant its t statistic.
  *
  * Tested per exposure surface (event_type) over DISTINCT exposed
  * users, because SRM is usually caused by one surface dropping logs
  * for one arm. Arithmetic: arm counts are exact integers from one
  * distinct-user aggregate; z = (n_a − n_b)/sqrt(n_a + n_b) is one
  * IEEE sqrt + one division of exact integers, bit-portable. The only
  * shuffle is the (event_type, user_id) distinct — map-side combined,
  * keys bounded by users × surfaces.
  */
object Srm {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_srm",
      Some("""
        WITH exposed AS (
          SELECT DISTINCT event_type, user_id FROM events),
        arms AS (
          SELECT event_type,
                 SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
                 SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b
          FROM exposed GROUP BY event_type)
        SELECT event_type,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               n_a * 1.0 / (n_a + n_b) AS share_a,
               (n_a - n_b) / sqrt(CAST(n_a + n_b AS DOUBLE)) AS z,
               abs((n_a - n_b) / sqrt(CAST(n_a + n_b AS DOUBLE))) > 3.29 AS srm
        FROM arms
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        val arms = events(s, d)
          .select($"event_type", $"user_id").distinct()
          .groupBy($"event_type")
          .agg(
            sum(when($"user_id" % 2 === 0, 1).otherwise(0)).as("n_a"),
            sum(when($"user_id" % 2 === 1, 1).otherwise(0)).as("n_b"))
        val z = ($"n_a" - $"n_b") / sqrt(($"n_a" + $"n_b").cast("double"))
        arms.select($"event_type",
          $"n_a".cast("long").as("n_a"), $"n_b".cast("long").as("n_b"),
          ($"n_a" * lit(1.0) / ($"n_a" + $"n_b")).as("share_a"),
          z.as("z"), (abs(z) > 3.29).as("srm"))
          .orderBy($"event_type")
      }))
}
