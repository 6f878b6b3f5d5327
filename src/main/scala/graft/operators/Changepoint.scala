package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Change detection and concentration accounting over the events log:
  * exact single-changepoint binary segmentation per event type, and
  * the Gini coefficient of per-user value concentration.
  *
  * Integer-exact discipline: daily/user value totals are DECIMAL(18,2)
  * sums scaled by 100 into exact BIGINTs (z), all moment sums run in
  * DECIMAL (z² through a DECIMAL product — immune to int64 overflow at
  * any scale), and the SSE / Gini formulas then evaluate the identical
  * fixed-order double expression in both engines — no grid snapping
  * needed because every operand is identical before the first inexact
  * op.
  */
object Changepoint {

  val defs: Seq[QueryDef] = Seq(

    // Exact one-split binary segmentation per event type over the
    // daily value series: the split minimizing SSE_left + SSE_right
    // (ties to the earliest split day). Candidate evaluation is
    // closed-form from running prefix sums — one per-type window pass
    // over calendar-bounded rows, not a per-candidate rescan, so the
    // whole search is O(days) per type. The winning row reports both
    // segment means and the variance explained vs the unsplit series.
    QueryDef(
      "ts_changepoint",
      Some("""
        WITH daily AS (
          SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS z
          FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')),
        idx AS (
          SELECT event_type, day, z,
                 row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
          FROM daily),
        pre AS (
          SELECT event_type, day, z, i,
                 SUM(z) OVER w AS sl,
                 SUM(CAST(z AS DECIMAL(38,0)) * z) OVER w AS s2l
          FROM idx
          WINDOW w AS (PARTITION BY event_type ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        tot AS (
          SELECT event_type, SUM(z) AS st,
                 SUM(CAST(z AS DECIMAL(38,0)) * z) AS s2t, COUNT(*) AS n
          FROM daily GROUP BY event_type),
        cand AS (
          SELECT p.event_type, p.i + 1 AS s, p.i AS nl, t.n - p.i AS nr,
                 CAST(p.sl AS DOUBLE) AS sl, CAST(p.s2l AS DOUBLE) AS s2l,
                 CAST(t.st AS DOUBLE) - CAST(p.sl AS DOUBLE) AS sr,
                 CAST(t.s2t AS DOUBLE) - CAST(p.s2l AS DOUBLE) AS s2r,
                 CAST(t.st AS DOUBLE) AS st, CAST(t.s2t AS DOUBLE) AS s2t,
                 t.n AS n
          FROM pre p JOIN tot t ON t.event_type = p.event_type
          WHERE p.i <= t.n - 1),
        scored AS (
          SELECT *,
                 (s2l - sl * sl / nl) + (s2r - sr * sr / nr) AS sse,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY (s2l - sl * sl / nl) + (s2r - sr * sr / nr), s) AS rk
          FROM cand)
        SELECT c.event_type,
               x.day AS split_day,
               CAST(c.nl AS BIGINT) AS n_before,
               CAST(c.nr AS BIGINT) AS n_after,
               (c.sl / 100.0) / c.nl AS mean_before,
               (c.sr / 100.0) / c.nr AS mean_after,
               (c.s2t - c.st * c.st / c.n) / 10000.0 AS sse_total,
               c.sse / 10000.0 AS sse_split
        FROM scored c
        JOIN idx x ON x.event_type = c.event_type AND x.i = c.s
        WHERE c.rk = 1
        ORDER BY c.event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        val daily = events(s, d)
          .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
          .agg((sum($"value".cast(DecimalType(18, 2))) * 100).cast("long").as("z"))
        val wi = Window.partitionBy($"event_type").orderBy($"day")
        val idx = daily.withColumn("i", row_number().over(wi))
        val wp = Window.partitionBy($"event_type").orderBy($"i")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pre = idx
          .withColumn("sl", sum($"z").over(wp))
          .withColumn("s2l", sum($"z".cast(DecimalType(38, 0)) * $"z").over(wp))
        val tot = daily.groupBy($"event_type")
          .agg(sum($"z").as("st"),
            sum($"z".cast(DecimalType(38, 0)) * $"z").as("s2t"),
            count(lit(1)).as("n"))
        val cand = pre.join(tot, "event_type")
          .filter($"i" <= $"n" - 1)
          .select($"event_type", ($"i" + 1).as("s"), $"i".as("nl"), ($"n" - $"i").as("nr"),
            $"sl".cast("double").as("sl"), $"s2l".cast("double").as("s2l"),
            ($"st".cast("double") - $"sl".cast("double")).as("sr"),
            ($"s2t".cast("double") - $"s2l".cast("double")).as("s2r"),
            $"st".cast("double").as("st"), $"s2t".cast("double").as("s2t"), $"n")
        val sse = ($"s2l" - $"sl" * $"sl" / $"nl") + ($"s2r" - $"sr" * $"sr" / $"nr")
        val scored = cand
          .withColumn("sse", sse)
          .withColumn("rk", row_number().over(
            Window.partitionBy($"event_type").orderBy(sse, $"s")))
          .filter($"rk" === 1)
        scored.as("c")
          .join(idx.select($"event_type", $"i", $"day").as("x"),
            $"x.event_type" === $"c.event_type" && $"x.i" === $"c.s")
          .select($"c.event_type".as("event_type"),
            $"x.day".as("split_day"),
            $"c.nl".cast("long").as("n_before"),
            $"c.nr".cast("long").as("n_after"),
            (($"c.sl" / 100.0) / $"c.nl").as("mean_before"),
            (($"c.sr" / 100.0) / $"c.nr").as("mean_after"),
            (($"c.s2t" - $"c.st" * $"c.st" / $"c.n") / 10000.0).as("sse_total"),
            ($"c.sse" / 10000.0).as("sse_split"))
          .orderBy($"event_type")
      }),

    // Gini coefficient of per-user value concentration — the one-number
    // companion to ev_whale_curve: G = (2·Σ i·z_i − (n+1)·Σz) / (n·Σz)
    // over ascending-sorted user totals. The rank is the range-sharded
    // [[Pipeline.globalRank]] (no single-partition sort); ties in z are
    // rank-order-invariant in Σ i·z, so the score is deterministic.
    QueryDef(
      "ev_gini",
      Some("""
        WITH ut AS (
          SELECT user_id,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS z
          FROM events GROUP BY user_id),
        r AS (
          SELECT z, row_number() OVER (ORDER BY z, user_id) AS i FROM ut),
        m AS (
          SELECT SUM(CAST(i AS DECIMAL(38,0)) * z) AS siz,
                 SUM(z) AS sz, COUNT(*) AS n
          FROM r)
        SELECT CAST(n AS BIGINT) AS n_users,
               (2.0 * CAST(siz AS DOUBLE) - (n + 1.0) * CAST(sz AS DOUBLE))
                 / (n * CAST(sz AS DOUBLE)) AS gini
        FROM m
      """.trim),
      (s, d) => {
        import s.implicits._
        val ut = events(s, d)
          .groupBy($"user_id")
          .agg((sum($"value".cast(DecimalType(18, 2))) * 100).cast("long").as("z"))
        val ranked = Pipeline.globalRank(ut, Seq($"z", $"user_id"))
          .select($"z", ($"rank" + 1).as("i"))
        ranked.agg(
          sum($"i".cast(DecimalType(38, 0)) * $"z").as("siz"),
          sum($"z").as("sz"), count(lit(1)).as("n"))
          .select($"n".cast("long").as("n_users"),
            ((lit(2.0) * $"siz".cast("double") - ($"n" + lit(1.0)) * $"sz".cast("double"))
              / ($"n" * $"sz".cast("double"))).as("gini"))
      }))
}
