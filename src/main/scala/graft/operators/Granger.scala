package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Granger causality between the view and purchase event streams: does
  * last hour's view count improve a one-lag autoregression of this
  * hour's purchases (and vice versa)? The F-test on the nested OLS
  * pair — restricted z_t ~ z_{t-1}, full z_t ~ z_{t-1} + x_{t-1} —
  * with one numerator degree of freedom; F > 3.85 ≈ the 95% critical
  * value of F(1, 716).
  *
  * Determinism: both series live on the dense 720-hour grid (zeros
  * included — the ts_ar2 grid recipe), so every OLS moment (13 sums of
  * integer counts and their pairwise products) is an exact integer
  * routed through DECIMAL(38,0). The regression algebra is then a
  * fixed-order double expression over those exact integers, evaluated
  * from the SAME generated SQL text in both engines ([[fml]] feeds
  * Spark's `expr` and the DuckDB oracle verbatim), so even the IEEE
  * rounding sequence is shared by construction.
  *
  * Scale: one conditional count aggregate (map-side combined) + a
  * 720-row grid join; the lag window runs over the BOUNDED grid (720
  * rows by construction — a fixed property of the metric, not of the
  * data volume), and the readout is a 1-row moment table unioned into
  * two direction rows.
  */
object Granger {

  /** Shared formula text (Spark `expr` + DuckDB verbatim): centered
    * moments, the restricted/full RSS, and the nested-model F. */
  private def fml(n: String, sz: String, szz: String, su: String, suu: String,
      suz: String, sv: String, svv: String, svz: String, suv: String): Map[String, String] = {
    val uu = s"($suu - $su * $su / $n)"
    val uz = s"($suz - $su * $sz / $n)"
    val vv = s"($svv - $sv * $sv / $n)"
    val vz = s"($svz - $sv * $sz / $n)"
    val uv = s"($suv - $su * $sv / $n)"
    val zz = s"($szz - $sz * $sz / $n)"
    val det = s"($uu * $vv - $uv * $uv)"
    val b = s"(($uz * $vv - $vz * $uv) / $det)"
    val c = s"(($vz * $uu - $uz * $uv) / $det)"
    val rssR = s"($zz - $uz * $uz / $uu)"
    val rssF = s"($zz - $b * $uz - $c * $vz)"
    val f = s"(($rssR - $rssF) * ($n - 3) / $rssF)"
    Map("b_self" -> b, "b_cross" -> c, "f_stat" -> f, "significant" -> s"($f > 3.85)")
  }

  /** The 13 moment columns, as (name, SQL-sum-expression) pairs over a
    * lagged (p, v, p1, v1) row stream — DECIMAL-routed, emitted DOUBLE. */
  private val moments: Seq[(String, String)] = Seq(
    "sp" -> "p", "sv" -> "v", "sp1" -> "p1", "sv1" -> "v1",
    "spp" -> "p * p", "svv" -> "v * v",
    "sp1p1" -> "p1 * p1", "sv1v1" -> "v1 * v1", "sp1v1" -> "p1 * v1",
    "sp1p" -> "p1 * p", "sv1p" -> "v1 * p", "sv1v" -> "v1 * v", "sp1v" -> "p1 * v")

  // direction A: z = purchase, self-lag u = p1, cross x = v1
  private val dirA = fml("nd", "sp", "spp", "sp1", "sp1p1", "sp1p", "sv1", "sv1v1", "sv1p", "sp1v1")
  // direction B: z = view, self-lag u = v1, cross x = p1
  private val dirB = fml("nd", "sv", "svv", "sv1", "sv1v1", "sv1v", "sp1", "sp1p1", "sp1v", "sp1v1")

  private def dirSelect(name: String, m: Map[String, String]): String =
    s"""SELECT '$name' AS direction, CAST(nd AS BIGINT) AS n_obs,
               ${m("b_self")} AS b_self, ${m("b_cross")} AS b_cross,
               ${m("f_stat")} AS f_stat, ${m("significant")} AS significant
        FROM mom"""

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ts_granger",
      Some(s"""
        WITH cnt AS (
          SELECT (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) // 3600000000 AS h,
                 SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
          FROM events GROUP BY 1),
        grid AS (
          SELECT g.h, COALESCE(c.v, 0) AS v, COALESCE(c.p, 0) AS p
          FROM (SELECT unnest(range(0, 720)) AS h) g
          LEFT JOIN cnt c ON c.h = g.h),
        lagd AS (
          SELECT h, v, p,
                 lag(v) OVER (ORDER BY h) AS v1,
                 lag(p) OVER (ORDER BY h) AS p1
          FROM grid),
        mom AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
                 ${moments.map { case (nm, e) =>
                   s"CAST(SUM(CAST($e AS DECIMAL(38,0))) AS DOUBLE) AS $nm" }
                   .mkString(",\n                 ")}
          FROM lagd WHERE h >= 1)
        ${dirSelect("view->purchase", dirA)}
        UNION ALL
        ${dirSelect("purchase->view", dirB)}
        ORDER BY direction
      """.trim),
      (s, d) => {
        import s.implicits._
        val cnt = events(s, d)
          .select(expr("(unix_micros(ts) - 1704067200000000) DIV 3600000000").as("h"),
            $"event_type")
          .groupBy($"h")
          .agg(sum(when($"event_type" === "view", 1).otherwise(0)).as("v"),
            sum(when($"event_type" === "purchase", 1).otherwise(0)).as("p"))
        val grid = s.range(0, 720).select($"id".as("h"))
          .join(cnt, Seq("h"), "left")
          .select($"h", coalesce($"v", lit(0L)).as("v"), coalesce($"p", lit(0L)).as("p"))
        // bounded 720-row frame: a keyless window here is a property of
        // the fixed grid, not a data-sized single-partition sort
        val w = Window.orderBy($"h")
        val lagd = grid
          .withColumn("v1", lag($"v", 1).over(w))
          .withColumn("p1", lag($"p", 1).over(w))
          .filter($"h" >= 1)
        val mom = lagd.agg(
          count(lit(1)).cast("double").as("nd"),
          moments.map { case (nm, e) =>
            sum(expr(e).cast(DecimalType(38, 0))).cast("double").as(nm) }: _*)
        def dir(name: String, m: Map[String, String]) =
          mom.select(lit(name).as("direction"), $"nd".cast("long").as("n_obs"),
            expr(m("b_self")).as("b_self"), expr(m("b_cross")).as("b_cross"),
            expr(m("f_stat")).as("f_stat"), expr(m("significant")).as("significant"))
        dir("view->purchase", dirA).union(dir("purchase->view", dirB))
          .orderBy($"direction")
      }))
}
