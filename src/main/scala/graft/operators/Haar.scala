package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Haar wavelet energy spectrum of the hourly event-count series —
  * the multi-resolution decomposition used to locate at WHICH time
  * scale a series carries its variance (hour-of-day bursts vs weekly
  * drift). For level k (block 2^k hours), the unnormalized detail of
  * block b is d = Σcounts(left half) − Σcounts(right half); the
  * level's energy is Σ_b d²/2^k, and the block with the largest |d|
  * is the level's dominant transient (ties → smallest block index).
  *
  * The series is the first 512 hours (2^9) from the 2024-01-01
  * anchor, so levels 1..9 tile it exactly. Missing hours are zero
  * counts: a block absent from both halves contributes d = 0 and is
  * omitted identically by both engines.
  *
  * Determinism: counts are integers, so every d and d² is exact
  * BIGINT algebra; only the final /2^k division is double (one
  * fixed-order op, snapped).
  *
  * Scale: ONE hash aggregate to (type, hour) — calendar-bounded, not
  * data-bounded — then a 9-way explode of ≤512·|types| rows and a
  * second tiny aggregate. The 100 TB cost is the first aggregate's
  * map-side combine; everything after is O(hours·levels).
  */
object Haar {

  private val H = 512 // 2^9 hours
  private val maxLevel = 9

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ts_haar_energy",
      Some(s"""
        WITH hourly AS (
          SELECT event_type,
                 (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                   // 3600000000 AS h,
                 COUNT(*) AS c
          FROM events
          WHERE (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                  // 3600000000 < $H
            AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          GROUP BY 1, 2),
        lv AS (SELECT UNNEST(range(1, ${maxLevel + 1})) AS level),
        blocks AS (
          SELECT h.event_type, l.level,
                 h.h // (1 << l.level) AS b,
                 SUM(CASE WHEN (h.h // (1 << (l.level - 1))) % 2 = 0
                     THEN h.c ELSE -h.c END) AS d
          FROM hourly h CROSS JOIN lv l
          GROUP BY 1, 2, 3),
        en AS (
          SELECT event_type, level,
                 SUM(d * d) AS e2,
                 MAX(d * d) AS max_d2
          FROM blocks GROUP BY event_type, level),
        top AS (
          SELECT event_type, level, MIN(b) AS max_block
          FROM blocks bl
          WHERE d * d = (SELECT max_d2 FROM en e
                         WHERE e.event_type = bl.event_type
                           AND e.level = bl.level)
          GROUP BY event_type, level)
        SELECT e.event_type, CAST(e.level AS BIGINT) AS level,
               CAST($H / (1 << e.level) AS BIGINT) AS n_blocks,
               ${det.sqlSnap9("CAST(e.e2 AS DOUBLE) / (1 << e.level)")} AS energy,
               CAST(t.max_block AS BIGINT) AS max_block,
               CAST(e.max_d2 AS BIGINT) AS max_d2
        FROM en e JOIN top t
          ON t.event_type = e.event_type AND t.level = e.level
        ORDER BY e.event_type, e.level
      """.trim),
      (s, d) => {
        import s.implicits._
        val hourly = events(s, d)
          .select($"event_type",
            expr("(unix_micros(ts) - 1704067200000000) DIV 3600000000").as("h"))
          .filter($"h" >= 0 && $"h" < H)
          .groupBy($"event_type", $"h").agg(count(lit(1)).as("c"))
        val lv = s.range(1, maxLevel + 1).select($"id".cast("int").as("level"))
        val blocks = hourly.crossJoin(lv)
          .groupBy($"event_type", $"level",
            expr("h div (shiftleft(1, level))").as("b"))
          .agg(sum(when(expr("(h div shiftleft(1, level - 1)) % 2") === 0,
            $"c").otherwise(-$"c")).as("d"))
        val en = blocks.groupBy($"event_type".as("e_et"), $"level".as("e_lv"))
          .agg(sum($"d" * $"d").as("e2"), max($"d" * $"d").as("max_d2"))
        val top = blocks.join(en,
            $"event_type" === $"e_et" && $"level" === $"e_lv"
              && $"d" * $"d" === $"max_d2")
          .groupBy($"event_type", $"level")
          .agg(min($"b").as("max_block"))
        en.join(top, $"event_type" === $"e_et" && $"level" === $"e_lv")
          .select($"event_type", $"level".cast("long").as("level"),
            (lit(H) / pow(lit(2.0), $"e_lv")).cast("long").as("n_blocks"),
            det.snap9($"e2".cast("double") / pow(lit(2.0), $"e_lv")).as("energy"),
            $"max_block".cast("long").as("max_block"),
            $"max_d2".cast("long").as("max_d2"))
          .orderBy($"event_type", $"level")
      }))
}
