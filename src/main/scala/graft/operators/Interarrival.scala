package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Inter-arrival burstiness (Goh & Barabási, EPL 2008):
  * B = (σ−μ)/(σ+μ) over the per-user inter-event gaps, per event
  * type. B → −1 is a periodic process (gaps all equal), B ≈ 0 is
  * Poisson, B → +1 is maximally bursty (long silences broken by
  * trains) — the temporal fingerprint that separates humans (bursty)
  * from schedulers and naive bots (periodic), complementary to
  * ev_bot_detect's volume heuristics.
  *
  * Determinism: gaps are exact microsecond integers from one keyed
  * lag window; μ and σ come from exact HUGEINT/DECIMAL power sums;
  * B is one fixed-order double expression, snapped.
  *
  * Scale: one lag window keyed by (user, type) — each key's rows are
  * that user's events, never a global sort — and one moment
  * aggregate with map-side combine.
  */
object Interarrival {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_interarrival_burstiness",
      Some(s"""
        WITH lagged AS (
          SELECT event_type,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id)
                   AS gap
          FROM events),
        mo AS (
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(gap AS HUGEINT)) AS s1,
                 SUM(CAST(gap AS HUGEINT) * gap) AS s2
          FROM lagged WHERE gap IS NOT NULL
          GROUP BY event_type),
        st AS (
          SELECT event_type, n,
                 CAST(s1 AS DOUBLE) / n / 1000000.0 AS mu,
                 sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n)
                   / 1000000.0 AS sd
          FROM mo)
        SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
               ${det.sqlSnap9("mu")} AS mean_gap_s,
               ${det.sqlSnap9("sd")} AS sd_gap_s,
               ${det.sqlSnap9("(sd - mu) / (sd + mu)")} AS burstiness
        FROM st
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"event_type")
          .orderBy($"ts", $"event_id")
        val lagged = events(s, d)
          .select($"event_type",
            (expr("unix_micros(ts)")
              - lag(expr("unix_micros(ts)"), 1).over(w)).as("gap"))
          .filter($"gap".isNotNull)
        val hug = $"gap".cast(DecimalType(38, 0))
        val mo = lagged.groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum(hug).as("s1"),
            sum(hug * $"gap").as("s2"))
        val st = mo.select($"event_type", $"n",
          ($"s1".cast("double") / $"n" / 1000000.0).as("mu"),
          (sqrt(($"s2".cast("double") - $"s1".cast("double") * $"s1" / $"n")
            / $"n") / 1000000.0).as("sd"))
        st.select($"event_type", $"n".cast("long").as("n_gaps"),
            det.snap9($"mu").as("mean_gap_s"),
            det.snap9($"sd").as("sd_gap_s"),
            det.snap9(($"sd" - $"mu") / ($"sd" + $"mu")).as("burstiness"))
          .orderBy($"event_type")
      }))
}
