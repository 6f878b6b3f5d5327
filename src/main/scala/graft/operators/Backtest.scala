package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-origin forecast backtest — the evaluation loop every
  * forecasting deployment runs before trusting a model: three
  * one-step-ahead forecasters of the hourly purchase count (naive
  * last-value, seasonal-naive t−24, and the 24-hour moving average)
  * scored by MAE over the post-warmup grid (hours 168–719).
  *
  * Exactness: counts are integers, so naive/seasonal absolute errors
  * are exact integers, and the moving-average error is the exact
  * rational |24·y_t − Σ_{t-24..t-1}| / 24 — each model's MAE is ONE
  * double division of exact integer sums, bit-portable. All three
  * forecasters read the SAME ordered window pass (lag 1, lag 24, and
  * a 24-row sliding sum share one sort of the BOUNDED 720-row grid —
  * a fixed property of the metric, not of data volume; the count
  * aggregate that feeds it is map-side combined).
  */
object Backtest {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ts_backtest",
      Some("""
        WITH cnt AS (
          SELECT (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 3600000000 AS h,
                 COUNT(*) AS y
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        grid AS (
          SELECT g.h, COALESCE(c.y, 0) AS y
          FROM (SELECT unnest(range(0, 720)) AS h) g
          LEFT JOIN cnt c ON c.h = g.h),
        f AS (
          SELECT h, y,
                 lag(y, 1) OVER (ORDER BY h) AS y1,
                 lag(y, 24) OVER (ORDER BY h) AS y24,
                 SUM(y) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s24
          FROM grid),
        m AS (
          SELECT COUNT(*) AS n,
                 SUM(abs(y - y1)) AS e_naive,
                 SUM(abs(y - y24)) AS e_snaive,
                 SUM(abs(24 * y - s24)) AS e_ma_num
          FROM f WHERE h >= 168)
        SELECT model, CAST(n AS BIGINT) AS n_evals,
               CAST(err_num AS BIGINT) AS abs_err_num, mae
        FROM (
          SELECT 'ma24' AS model, n, e_ma_num AS err_num,
                 CAST(e_ma_num AS DOUBLE) / (24 * n) AS mae FROM m
          UNION ALL
          SELECT 'naive', n, e_naive, CAST(e_naive AS DOUBLE) / n FROM m
          UNION ALL
          SELECT 'snaive24', n, e_snaive, CAST(e_snaive AS DOUBLE) / n FROM m)
        ORDER BY model
      """.trim),
      (s, d) => {
        import s.implicits._
        val cnt = events(s, d)
          .filter($"event_type" === "purchase")
          .select(expr("(unix_micros(ts) - 1704067200000000) DIV 3600000000").as("h"))
          .groupBy($"h").agg(count(lit(1)).as("y"))
        val grid = s.range(0, 720).select($"id".as("h"))
          .join(cnt, Seq("h"), "left")
          .select($"h", coalesce($"y", lit(0L)).as("y"))
        // bounded 720-row frame — see ts_granger's grid note
        val w = Window.orderBy($"h")
        val f = grid
          .withColumn("y1", lag($"y", 1).over(w))
          .withColumn("y24", lag($"y", 24).over(w))
          .withColumn("s24", sum($"y").over(w.rowsBetween(-24, -1)))
          .filter($"h" >= 168)
        val m = f.agg(count(lit(1)).as("n"),
          sum(abs($"y" - $"y1")).as("e_naive"),
          sum(abs($"y" - $"y24")).as("e_snaive"),
          sum(abs(lit(24) * $"y" - $"s24")).as("e_ma_num"))
        def row(model: String, err: org.apache.spark.sql.Column, denom: org.apache.spark.sql.Column) =
          m.select(lit(model).as("model"), $"n".cast("long").as("n_evals"),
            err.cast("long").as("abs_err_num"),
            (err.cast("double") / denom).as("mae"))
        row("ma24", $"e_ma_num", lit(24) * $"n")
          .union(row("naive", $"e_naive", $"n"))
          .union(row("snaive24", $"e_snaive", $"n"))
          .orderBy($"model")
      }))
}
