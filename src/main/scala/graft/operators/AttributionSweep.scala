package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Attribution-window sensitivity sweep — the policy audit every
  * attribution system owes its stakeholders: for lookback windows of
  * 1 h / 6 h / 24 h, what share of purchases has ANY preceding
  * non-purchase touch inside the window (attributable), and what is
  * their value share? A metric that moves a lot between 6 h and 24 h
  * is window-driven, not behavior-driven — the number teams fight
  * about when "conversions" differ between tools with different
  * default windows.
  *
  * Determinism: the preceding-touch gap is one keyed lag over each
  * user's ordered events (exact microseconds); window membership is
  * an integer comparison against literal bounds; value shares fold as
  * cent-scaled DECIMAL.
  *
  * Scale: ONE keyed window pass + one aggregate per purchase ×
  * 3-row literal window join — linear, no per-window rescans.
  */
object AttributionSweep {

  private val windows = Seq(("1h", 3600000000L), ("6h", 21600000000L),
    ("24h", 86400000000L))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_attribution_window_sweep", {
        val wRows = windows.map { case (n, us) => s"('$n', $us)" }.mkString(", ")
        Some(s"""
        WITH seq AS (
          SELECT event_type, epoch_us(ts) AS us,
                 CAST(value AS DECIMAL(18,2)) AS v,
                 MAX(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_touch
          FROM events),
        pur AS (
          SELECT us, v, prev_touch FROM seq WHERE event_type = 'purchase'),
        w(win, span) AS (VALUES $wRows),
        sweep AS (
          SELECT w.win, w.span,
                 COUNT(*) AS n_purchases,
                 SUM(CASE WHEN p.prev_touch IS NOT NULL
                          AND p.us - p.prev_touch <= w.span
                     THEN 1 ELSE 0 END) AS n_attributed,
                 CAST(SUM(p.v) * 100 AS BIGINT) AS total_c,
                 CAST(SUM(CASE WHEN p.prev_touch IS NOT NULL
                          AND p.us - p.prev_touch <= w.span
                     THEN p.v ELSE CAST(0 AS DECIMAL(18,2)) END) * 100
                   AS BIGINT) AS attr_c
          FROM pur p CROSS JOIN w
          GROUP BY w.win, w.span)
        SELECT win AS window, CAST(n_purchases AS BIGINT) AS n_purchases,
               CAST(n_attributed AS BIGINT) AS n_attributed,
               ${det.sqlSnap9("n_attributed * 1.0 / n_purchases")} AS attr_rate,
               ${det.sqlSnap9("attr_c * 1.0 / total_c")} AS attr_value_share
        FROM sweep
        ORDER BY span
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val uw = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val seq0 = events(s, d).select($"event_type",
          expr("unix_micros(ts)").as("us"),
          $"value".cast(DecimalType(18, 2)).as("v"),
          // latest preceding touch = MAX over the strict-prefix frame
          // (timestamps are monotone in the window order)
          max(when($"event_type" =!= "purchase", expr("unix_micros(ts)")))
            .over(uw.rowsBetween(Window.unboundedPreceding, -1))
            .as("prev_touch"))
        val pur = seq0.filter($"event_type" === "purchase")
        val w = windows.toDF("win", "span")
        val z = lit(0).cast(DecimalType(18, 2))
        val sweep = pur.crossJoin(broadcast(w))
          .groupBy($"win", $"span")
          .agg(count(lit(1)).as("n_purchases"),
            sum(when($"prev_touch".isNotNull
              && $"us" - $"prev_touch" <= $"span", 1).otherwise(0))
              .as("n_attributed"),
            (sum($"v") * 100).cast("long").as("total_c"),
            (sum(when($"prev_touch".isNotNull
              && $"us" - $"prev_touch" <= $"span", $"v").otherwise(z)) * 100)
              .cast("long").as("attr_c"))
        sweep.select($"win".as("window"),
            $"n_purchases".cast("long").as("n_purchases"),
            $"n_attributed".cast("long").as("n_attributed"),
            det.snap9($"n_attributed" * lit(1.0) / $"n_purchases")
              .as("attr_rate"),
            det.snap9($"attr_c" * lit(1.0) / $"total_c")
              .as("attr_value_share"),
            $"span")
          .orderBy($"span")
          .drop("span")
      }))
}
