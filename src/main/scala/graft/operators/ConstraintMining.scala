package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Learned-constraint mining + validation (the TFX Data Validation /
  * Deequ pattern, Polyzotis et al. SIGMOD'17; Schelter et al.
  * VLDB'18): PROFILE a training split to learn per-key constraints,
  * then count violations on the serving split — schema drift you can
  * alert on without hand-writing a single rule. `dq_expectations`
  * checks STATIC rules; this learns them, which is the only thing that
  * scales past a handful of tables.
  *
  * Split: even calendar days train, odd days validate (deterministic,
  * disjoint, interleaved — immune to trend confounds a head/tail split
  * would bake in). Learned per event_type: value range [min, max] with
  * a ±10% tolerance band, and the historical daily-volume range. The
  * report counts serving rows outside the band and serving DAYS
  * outside the volume range.
  *
  * Determinism: bounds are exact decimal min/max widened by an exact
  * decimal fraction; violation counts are integer comparisons against
  * those bounds. Scale: two grouped aggregates + one broadcast-joined
  * validation scan; nothing corpus-wide crosses an order-by.
  */
object ConstraintMining {

  /** Events with an exact day index (di = days since corpus min) and
    * the cent-exact value — the split axis for train/validate. */
  def withDayIndex(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dd = ev.agg(min(col("ts").cast("date")).as("d0"))
    ev.crossJoin(broadcast(dd))
      .select(col("event_id"), col("event_type"),
        col("value").cast(DecimalType(18, 2)).as("v"),
        datediff(col("ts").cast("date"), col("d0")).as("di"))
  }

  /** The learned per-type value band [lo, hi] (exact decimal min/max ±
    * 10%) from the TRAIN split (even days) — the profile artifact the
    * batch query AND the streaming monitor twin validate against. */
  def learnedBounds(evDays: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tol = lit(BigDecimal("0.1")).cast(DecimalType(6, 2))
    evDays.filter(col("di") % 2 === 0)
      .groupBy(col("event_type"))
      .agg((min(col("v")) - tol * abs(min(col("v")))).as("lo"),
        (max(col("v")) + tol * abs(max(col("v")))).as("hi"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_constraint_mining",
      Some(s"""
        WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        ev AS (
          SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
                 CAST(ts AS DATE) - d0.d0 AS di
          FROM events CROSS JOIN d0),
        learned AS (
          SELECT event_type,
                 MIN(v) - CAST(0.1 AS DECIMAL(6,2)) * abs(MIN(v)) AS lo,
                 MAX(v) + CAST(0.1 AS DECIMAL(6,2)) * abs(MAX(v)) AS hi
          FROM ev WHERE di % 2 = 0 GROUP BY event_type),
        lvol AS (
          SELECT event_type, MIN(cnt) AS vol_lo, MAX(cnt) AS vol_hi
          FROM (SELECT event_type, di, COUNT(*) AS cnt
                FROM ev WHERE di % 2 = 0 GROUP BY event_type, di)
          GROUP BY event_type),
        serve AS (SELECT * FROM ev WHERE di % 2 = 1),
        vio AS (
          SELECT s.event_type,
                 CAST(COUNT(*) AS BIGINT) AS serve_rows,
                 CAST(SUM(CASE WHEN s.v < l.lo OR s.v > l.hi
                               THEN 1 ELSE 0 END) AS BIGINT) AS value_violations
          FROM serve s JOIN learned l USING (event_type)
          GROUP BY s.event_type),
        vvol AS (
          SELECT d.event_type,
                 CAST(COUNT(*) AS BIGINT) AS serve_days,
                 CAST(SUM(CASE WHEN d.cnt < v.vol_lo OR d.cnt > v.vol_hi
                               THEN 1 ELSE 0 END) AS BIGINT) AS volume_violations
          FROM (SELECT event_type, di, COUNT(*) AS cnt
                FROM serve GROUP BY event_type, di) d
          JOIN lvol v USING (event_type)
          GROUP BY d.event_type)
        SELECT l.event_type,
               CAST(l.lo AS DOUBLE) AS lo, CAST(l.hi AS DOUBLE) AS hi,
               o.serve_rows, o.value_violations,
               ${det.sqlSnap9("o.value_violations * 1.0 / o.serve_rows")}
                 AS violation_rate,
               w.serve_days, w.volume_violations
        FROM learned l JOIN vio o USING (event_type)
        JOIN vvol w USING (event_type)
        ORDER BY l.event_type
      """.trim),
      (s, d) => {
        val ev = withDayIndex(events(s, d))
          .drop("event_id")
          .localCheckpoint() // train profile + two serving passes
        val learned = learnedBounds(ev)
        val lvol = ev.filter(col("di") % 2 === 0)
          .groupBy(col("event_type"), col("di"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("event_type"))
          .agg(min(col("cnt")).as("vol_lo"), max(col("cnt")).as("vol_hi"))
        val serve = ev.filter(col("di") % 2 === 1)
        val vio = serve.join(broadcast(learned), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("serve_rows"),
            sum(when(col("v") < col("lo") || col("v") > col("hi"), 1L)
              .otherwise(0L)).cast("long").as("value_violations"))
        val vvol = serve.groupBy(col("event_type"), col("di"))
          .agg(count(lit(1)).as("cnt"))
          .join(broadcast(lvol), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("serve_days"),
            sum(when(col("cnt") < col("vol_lo") || col("cnt") > col("vol_hi"),
              1L).otherwise(0L)).cast("long").as("volume_violations"))
        learned.join(vio, "event_type").join(vvol, "event_type")
          .select(col("event_type"),
            col("lo").cast("double").as("lo"),
            col("hi").cast("double").as("hi"),
            col("serve_rows"), col("value_violations"),
            det.snap9(col("value_violations") * 1.0 / col("serve_rows"))
              .as("violation_rate"),
            col("serve_days"), col("volume_violations"))
          .orderBy(col("event_type"))
      }))
}
