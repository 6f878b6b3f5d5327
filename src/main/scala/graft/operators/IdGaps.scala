package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-id continuity audit — the ingestion QA check for
  * supposedly gap-free id columns (event ids, commit-log offsets):
  * islands of consecutive event_id values via the value-minus-rank
  * trick, reporting per-table-scan the id span, distinct count,
  * duplicate count, number of gaps, total missing ids, and the 3
  * largest holes (start, length) — the evidence a pipeline drops or
  * double-delivers records. ONE query answers both "are we losing
  * data" and "where". The harness events table is gap-free, so the
  * audited view simulates a lossy consumer by dropping ids ≡ 13
  * (mod 97) — a planted defect the audit must localize exactly, the
  * dq_fd_check discipline of testing the test.
  *
  * Determinism: pure integer arithmetic; hole ranking ties break on
  * start id.
  *
  * Scale: a distinct + ONE ordered-by-id ranking pass implemented as
  * a range-sharded global rank ([[Pipeline.globalRank]], one count
  * per shard of driver traffic — never a single-partition window),
  * then island aggregates.
  */
object IdGaps {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_id_gaps",
      Some("""
        WITH ids AS (SELECT DISTINCT event_id AS id FROM events
                     WHERE event_id % 97 <> 13),
        dup AS (
          SELECT COUNT(*) - COUNT(DISTINCT event_id) AS n_dup FROM events
          WHERE event_id % 97 <> 13),
        isl AS (
          SELECT id, id - ROW_NUMBER() OVER (ORDER BY id) AS island
          FROM ids),
        runs AS (
          SELECT island, MIN(id) AS lo, MAX(id) AS hi, COUNT(*) AS n
          FROM isl GROUP BY island),
        holes AS (
          SELECT hi + 1 AS hole_start,
                 lead(lo) OVER (ORDER BY lo) - hi - 1 AS hole_len
          FROM runs),
        hstat AS (
          SELECT COUNT(*) AS n_gaps, SUM(hole_len) AS missing
          FROM holes WHERE hole_len IS NOT NULL AND hole_len > 0),
        top AS (
          SELECT hole_start, hole_len,
                 ROW_NUMBER() OVER (ORDER BY hole_len DESC, hole_start) AS rk
          FROM holes WHERE hole_len IS NOT NULL AND hole_len > 0),
        span AS (
          SELECT MIN(id) AS lo, MAX(id) AS hi, COUNT(*) AS n_ids FROM ids)
        SELECT CAST(t.rk AS BIGINT) AS rank,
               CAST(t.hole_start AS BIGINT) AS hole_start,
               CAST(t.hole_len AS BIGINT) AS hole_len,
               CAST(s.n_ids AS BIGINT) AS n_ids,
               CAST(s.hi - s.lo + 1 AS BIGINT) AS id_span,
               CAST(h.n_gaps AS BIGINT) AS n_gaps,
               CAST(h.missing AS BIGINT) AS n_missing,
               CAST(d.n_dup AS BIGINT) AS n_duplicates
        FROM top t CROSS JOIN span s CROSS JOIN hstat h CROSS JOIN dup d
        WHERE t.rk <= 3
        ORDER BY rank
      """.trim),
      (s, d) => {
        import s.implicits._
        val ev = events(s, d)
        val lossy = ev.filter($"event_id" % 97 =!= 13)
        val ids = lossy.select($"event_id".as("id")).distinct()
        val dup = lossy.agg((count(lit(1)) - countDistinct($"event_id"))
          .as("n_dup"))
        val ranked = Pipeline.globalRank(ids, Seq($"id"))
        val isl = ranked.select($"id", ($"id" - $"rank" - 1).as("island"))
        val runs = isl.groupBy($"island")
          .agg(min($"id").as("lo"), max($"id").as("hi"), count(lit(1)).as("n"))
        // runs are the maximal islands; holes live between consecutive
        // islands — the runs relation is |gaps|+1 rows, tiny, so the
        // unpartitioned lead window here orders islands, not ids
        val w = Window.orderBy($"lo")
        val holes = runs
          .select(($"hi" + 1).as("hole_start"),
            (lead($"lo", 1).over(w) - $"hi" - 1).as("hole_len"))
          .filter($"hole_len".isNotNull && $"hole_len" > 0)
        val hstat = holes.agg(count(lit(1)).as("n_gaps"),
          coalesce(sum($"hole_len"), lit(0L)).as("missing"))
        val top = holes.withColumn("rk",
            row_number().over(Window.orderBy($"hole_len".desc, $"hole_start")))
          .filter($"rk" <= 3)
        val span = ids.agg(min($"id").as("lo"), max($"id").as("hi"),
          count(lit(1)).as("n_ids"))
        top.crossJoin(broadcast(span)).crossJoin(broadcast(hstat))
          .crossJoin(broadcast(dup))
          .select($"rk".cast("long").as("rank"),
            $"hole_start".cast("long").as("hole_start"),
            $"hole_len".cast("long").as("hole_len"),
            $"n_ids".cast("long").as("n_ids"),
            ($"hi" - $"lo" + 1).cast("long").as("id_span"),
            $"n_gaps".cast("long").as("n_gaps"),
            $"missing".cast("long").as("n_missing"),
            $"n_dup".cast("long").as("n_duplicates"))
          .orderBy($"rank")
      }))
}
