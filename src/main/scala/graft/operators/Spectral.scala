package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Single-bin DFT seasonality strength per event type: spectral power
  * at candidate periods (24h / 12h / 8h / 6h) over the hourly value
  * series — the frequency-domain answer to "which cycle dominates",
  * where ts_seasonality's rank test only says "some cycle exists".
  *
  * Determinism: libm trig is NOT bit-portable, so the sin/cos basis is
  * a GENERATED LITERAL table — Scala computes cos(2πk/P) once and
  * embeds the exact same shortest-round-trip literal in both the Spark
  * plan and the oracle SQL (both parsers are correctly-rounded, so the
  * double bits match). Per-term products are snapped to the 1e-4 grid
  * before DECIMAL sums; the final power = sc² + ss² is fixed-order
  * IEEE on identical operands.
  *
  * Scale: one hourly aggregation over events, then |periods|·|types|
  * basis-weighted DECIMAL sums in ONE hash aggregate — the basis table
  * is a 50-row broadcast; nothing sequential, nothing driver-side.
  */
object Spectral {

  private val periods = Seq(24, 12, 8, 6)

  /** (period, idx, cos, sin) literal rows — the shared basis. */
  private val basis: Seq[(Int, Int, Double, Double)] =
    for (p <- periods; k <- 0 until p) yield
      (p, k, Math.cos(2.0 * Math.PI * k / p), Math.sin(2.0 * Math.PI * k / p))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ts_spectral_peak", {
        val rows = basis.map { case (p, k, c, sn) => s"($p, $k, $c, $sn)" }
          .mkString(",\n            ")
        Some(s"""
        WITH hourly AS (
          SELECT event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hb,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
          FROM events GROUP BY event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600),
        b(p, k, c, s) AS (
          VALUES
            $rows),
        terms AS (
          SELECT h.event_type, b.p,
                 CAST(floor(h.y * b.c * 10000 + 0.5) / 10000 AS DECIMAL(28,8)) AS tc,
                 CAST(floor(h.y * b.s * 10000 + 0.5) / 10000 AS DECIMAL(28,8)) AS ts
          FROM hourly h JOIN b ON b.k = h.hb % b.p),
        sums AS (
          SELECT event_type, p,
                 CAST(SUM(tc) AS DOUBLE) AS sc,
                 CAST(SUM(ts) AS DOUBLE) AS ss,
                 COUNT(*) AS n
          FROM terms GROUP BY event_type, p)
        SELECT event_type, CAST(p AS BIGINT) AS period_h,
               CAST(n AS BIGINT) AS n_hours,
               (sc * sc + ss * ss) / (n * n) AS power
        FROM sums
        ORDER BY event_type, period_h
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val hourly = events(s, d)
          .groupBy($"event_type",
            (floor(unix_timestamp($"ts")).cast("long") / 3600)
              .cast("long").as("hb"))
          .agg(sum($"value".cast(DecimalType(18, 2))).cast("double").as("y"))
        val b = basis.toDF("p", "k", "c", "s2")
        val terms = hourly.join(broadcast(b), $"k" === $"hb" % $"p")
          .select($"event_type", $"p",
            (floor($"y" * $"c" * 10000 + 0.5) / 10000)
              .cast(DecimalType(28, 8)).as("tc"),
            (floor($"y" * $"s2" * 10000 + 0.5) / 10000)
              .cast(DecimalType(28, 8)).as("ts"))
        terms.groupBy($"event_type", $"p")
          .agg(sum($"tc").cast("double").as("sc"),
            sum($"ts").cast("double").as("ss"),
            count(lit(1)).as("n"))
          .select($"event_type", $"p".cast("long").as("period_h"),
            $"n".cast("long").as("n_hours"),
            (($"sc" * $"sc" + $"ss" * $"ss") / ($"n" * $"n")).as("power"))
          .orderBy($"event_type", $"period_h")
      }))
}
