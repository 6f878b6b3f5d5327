package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Banded dynamic time warping between users' daily purchase series —
  * the alignment-tolerant similarity [[TimeSeries]]'s lockstep
  * cross-correlation can't express (a user whose weekly cycle is
  * shifted two days still warps onto a peer cheaply). Sakoe–Chiba band
  * of ±3 days bounds the DP to O(n·band) per pair.
  *
  * Spark shape: the per-user series is a bounded 30-day array built by
  * one grid left-join + one collect aggregate; the DP runs row-local
  * inside a UDF over the pair join — the idiomatic placement for a
  * sequential recurrence (per-row work is O(n·band), no cross-row
  * state, so it distributes perfectly across pairs; pairs are capped
  * to a 5-user panel here, and at scale DTW screening runs behind a
  * cheap lower-bound filter the same way). All costs are integer
  * cents (per-value round, integer day sums), so the DP is exact and
  * the DuckDB oracle — the full 58-diagonal recurrence unrolled as
  * chained CTEs, three LEFT JOINs per diagonal, the same proof
  * pattern as [[Graph]]'s unrolled PageRank — matches bit-for-bit.
  */
object Dtw {

  private val nDays = 30
  private val band = 3
  private val nUsers = 5
  private val BIG = 4611686018427387904L // Long.MaxValue/2: addition-safe infinity

  /** Banded DTW over two equal-length integer series. */
  private[operators] def dtwBand(a: Seq[Long], b: Seq[Long], w: Int): Long = {
    val n = a.length
    val dp = Array.fill(n, n)(BIG)
    var i = 0
    while (i < n) {
      var j = math.max(0, i - w)
      val jMax = math.min(n - 1, i + w)
      while (j <= jMax) {
        val c = math.abs(a(i) - b(j))
        val best =
          if (i == 0 && j == 0) 0L
          else {
            var m = BIG
            if (i > 0 && j - (i - 1) <= w) m = math.min(m, dp(i - 1)(j))
            if (j > 0 && (i - (j - 1)) <= w) m = math.min(m, dp(i)(j - 1))
            if (i > 0 && j > 0) m = math.min(m, dp(i - 1)(j - 1))
            m
          }
        dp(i)(j) = c + best
        j += 1
      }
      i += 1
    }
    dp(n - 1)(n - 1)
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ts_dtw_band", {
        def diag(k: Int): String = {
          val preds =
            (if (k >= 1) Seq(
              s"LEFT JOIN d${k - 1} a ON a.ua = c.ua AND a.ub = c.ub AND a.i = c.i - 1 AND a.j = c.j",
              s"LEFT JOIN d${k - 1} b ON b.ua = c.ua AND b.ub = c.ub AND b.i = c.i AND b.j = c.j - 1")
            else Nil) ++
            (if (k >= 2) Seq(
              s"LEFT JOIN d${k - 2} e ON e.ua = c.ua AND e.ub = c.ub AND e.i = c.i - 1 AND e.j = c.j - 1")
            else Nil)
          val terms = Seq(
            if (k >= 1) Some(s"coalesce(a.dp, $BIG)") else None,
            if (k >= 1) Some(s"coalesce(b.dp, $BIG)") else None,
            if (k >= 2) Some(s"coalesce(e.dp, $BIG)") else None).flatten
          val best = if (terms.isEmpty) "0" else s"least(${terms.mkString(", ")})"
          s"""d$k AS MATERIALIZED (
             SELECT c.ua, c.ub, c.i, c.j, c.c + $best AS dp
             FROM cost c ${preds.mkString(" ")}
             WHERE c.i + c.j = $k)"""
        }
        val lastDiag = 2 * (nDays - 1)
        Some(s"""
          WITH users AS (
            SELECT user_id FROM (SELECT DISTINCT user_id FROM events
                                 ORDER BY user_id LIMIT $nUsers)),
          days AS (SELECT r AS day FROM range(0, $nDays) t(r)),
          sums AS (
            SELECT user_id,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS c
            FROM events
            WHERE event_type = 'purchase'
              AND user_id IN (SELECT user_id FROM users)
            GROUP BY 1, 2),
          grid AS (
            SELECT u.user_id, d.day, coalesce(s.c, 0) AS c
            FROM users u CROSS JOIN days d
            LEFT JOIN sums s ON s.user_id = u.user_id AND s.day = d.day),
          pairs AS (
            SELECT a.user_id AS ua, b.user_id AS ub
            FROM users a JOIN users b ON a.user_id < b.user_id),
          cost AS MATERIALIZED (
            SELECT p.ua, p.ub, ga.day AS i, gb.day AS j, abs(ga.c - gb.c) AS c
            FROM pairs p
            JOIN grid ga ON ga.user_id = p.ua
            JOIN grid gb ON gb.user_id = p.ub
            WHERE abs(ga.day - gb.day) <= $band),
          ${(0 to lastDiag).map(diag).mkString(",\n")}
          SELECT CAST(ua AS BIGINT) AS user_a, CAST(ub AS BIGINT) AS user_b,
                 CAST(dp AS BIGINT) AS dtw_cents
          FROM d$lastDiag
          ORDER BY user_a, user_b
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val ev = events(s, d)
        val users = ev.select($"user_id").distinct()
          .orderBy($"user_id").limit(nUsers)
        val sums = ev.filter($"event_type" === "purchase")
          .join(broadcast(users), "user_id")
          .select($"user_id",
            datediff($"ts".cast("date"), lit("2024-01-01").cast("date")).as("day"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cv"))
          .groupBy($"user_id", $"day").agg(sum($"cv").as("c"))
        val days = s.range(0, nDays).select($"id".cast("int").as("day"))
        val grid = users.crossJoin(broadcast(days))
          .join(sums, Seq("user_id", "day"), "left")
          .na.fill(0L, Seq("c"))
        val series = grid.groupBy($"user_id")
          .agg(transform(array_sort(collect_list(struct($"day", $"c"))),
            x => x.getField("c")).as("s"))
        val dtwUdf = udf((a: Seq[Long], b: Seq[Long]) => dtwBand(a, b, band))
        series.as("a").join(series.as("b"), $"a.user_id" < $"b.user_id")
          .select($"a.user_id".cast("long").as("user_a"),
            $"b.user_id".cast("long").as("user_b"),
            dtwUdf($"a.s", $"b.s").as("dtw_cents"))
          .orderBy($"user_a", $"user_b")
      }))
}
