package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trend extraction over per-user daily event series: Holt linear
  * (double-exponential) smoothing and the Theil-Sen robust slope —
  * the forecasting and drift-detection primitives one level up from
  * ts_ewma's single-parameter smoother.
  *
  * Determinism: the daily inputs are exact DECIMAL sums cast to
  * DOUBLE (identical in both engines), every smoothing coefficient is
  * the binary fraction 1/2 (multiplication is exact scaling), and the
  * recurrences/slopes then run the same fixed-order IEEE arithmetic
  * on identical operands — bit-identical without any grid snapping.
  *
  * Scale: everything is keyed by user_id; per-user state is one row
  * per calendar DAY (bounded by the dataset's time span, not by
  * |events|), so the sequential per-user scan inside holt() is a
  * bounded-array fold — the same contract as a windowed aggregate —
  * and Theil-Sen's pair join is days², also calendar-bounded.
  */
object Trend {

  /** Per-(user, day) exact value sums, day as ISO string (sorts
    * chronologically), value as the decimal-exact double. */
  private def daily(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double").as("y"))

  private val dailySql: String = """
    daily AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d'))"""

  /** Holt recurrence over one user's chronologically-sorted series.
    * α = β = 1/2: level = y/2 + (l+b)/2, trend = (l−lp)/2 + bp/2.
    * The oracle's recursive CTE spells out the identical expression
    * tree, so the doubles match bitwise. */
  private val holtUdf = udf((ds: Seq[String], ys: Seq[Double]) => {
    val n = ds.length
    if (n < 2) Seq.empty[(String, Double, Double, Double)]
    else {
      var l = ys.head
      var b = ys(1) - ys.head
      val out = scala.collection.mutable.ArrayBuffer((ds.head, ys.head, l, b))
      var i = 1
      while (i < n) {
        val lp = l; val bp = b
        l = 0.5 * ys(i) + 0.5 * (lp + bp)
        b = 0.5 * (l - lp) + 0.5 * bp
        out += ((ds(i), ys(i), l, b))
        i += 1
      }
      out.toSeq
    }
  })

  val defs: Seq[QueryDef] = Seq(

    // Holt linear smoothing per user: level + trend per day, the
    // h-step-ahead forecast being level + h·trend. One daily
    // aggregation, one per-user sort+fold (collect_list over the
    // calendar-bounded day array, sequential recurrence in a UDF,
    // posexplode back out) — the recurrence is inherently sequential
    // per key, so a bounded per-key fold IS the distributed shape.
    // Users with a single active day carry no trend and are dropped
    // (mirrored in the oracle's i=1 init join).
    QueryDef(
      "ts_holt_linear",
      Some(s"""
        WITH RECURSIVE $dailySql,
        idx AS (
          SELECT user_id, day, y,
                 row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS i
          FROM daily),
        rec AS (
          SELECT i0.user_id, i0.i, i0.day, i0.y,
                 i0.y AS l, i1.y - i0.y AS b
          FROM idx i0 JOIN idx i1
            ON i1.user_id = i0.user_id AND i1.i = 1
          WHERE i0.i = 0
          UNION ALL
          SELECT x.user_id, x.i, x.day, x.y,
                 0.5 * x.y + 0.5 * (r.l + r.b) AS l,
                 0.5 * ((0.5 * x.y + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b AS b
          FROM rec r JOIN idx x
            ON x.user_id = r.user_id AND x.i = r.i + 1)
        SELECT CAST(user_id AS BIGINT) AS user_id, day, y,
               l AS level, b AS trend, l + b AS forecast_1d
        FROM rec
        ORDER BY user_id, day
      """.trim),
      (s, d) => {
        import s.implicits._
        val arr = daily(s, d)
          .groupBy($"user_id")
          .agg(sort_array(collect_list(struct($"day", $"y"))).as("sorted"))
          .select($"user_id",
            holtUdf($"sorted.day", $"sorted.y").as("h"))
        arr.select($"user_id", explode($"h").as("r"))
          .select($"user_id", $"r._1".as("day"), $"r._2".as("y"),
            $"r._3".as("level"), $"r._4".as("trend"),
            ($"r._3" + $"r._4").as("forecast_1d"))
          .orderBy($"user_id", $"day")
      }),

    // Theil-Sen robust trend per user: the (lower) median of all
    // pairwise daily slopes — outlier days move OLS arbitrarily but
    // shift a slope median by one rank. The pair join is per-user
    // days² (calendar-bounded); the median is an exact rank selection
    // under a total order, not an interpolation, so the reported value
    // is one of the computed slopes verbatim in both engines.
    QueryDef(
      "ts_theil_sen",
      Some(s"""
        WITH $dailySql,
        dd AS (
          SELECT user_id, y,
                 datediff('day', DATE '1970-01-01', CAST(day AS DATE)) AS t
          FROM daily),
        pairs AS (
          SELECT a.user_id, (b.y - a.y) / (b.t - a.t) AS m
          FROM dd a JOIN dd b
            ON b.user_id = a.user_id AND b.t > a.t),
        ranked AS (
          SELECT user_id, m,
                 row_number() OVER (PARTITION BY user_id ORDER BY m) AS r,
                 COUNT(*) OVER (PARTITION BY user_id) AS c
          FROM pairs)
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(c AS BIGINT) AS n_pairs,
               m AS theil_slope
        FROM ranked
        WHERE r = (c + 1) // 2
        ORDER BY user_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val dd = daily(s, d)
          .select($"user_id", $"y",
            datediff(to_date($"day"), lit("1970-01-01").cast("date")).as("t"))
        val pairs = dd.as("a")
          .join(dd.as("b"),
            $"b.user_id" === $"a.user_id" && $"b.t" > $"a.t")
          .select($"a.user_id",
            (($"b.y" - $"a.y") / ($"b.t" - $"a.t")).as("m"))
        val w = Window.partitionBy($"user_id")
        pairs
          .withColumn("r", row_number().over(w.orderBy($"m")))
          .withColumn("c", count(lit(1)).over(w))
          // integer floor-division: Spark's `/` on longs yields DOUBLE
          // (218.5 for even c), silently matching no rank — floor it
          .filter($"r" === floor(($"c" + 1) / 2).cast("long"))
          .select($"user_id", $"c".as("n_pairs"), $"m".as("theil_slope"))
          .orderBy($"user_id")
      }))
}
