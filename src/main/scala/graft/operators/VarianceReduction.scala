package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Variance-reduction audit for experiment metrics (Deng, Xu, Kohavi &
  * Walker, "Improving the sensitivity of online controlled
  * experiments", WSDM 2013): before an experimentation platform
  * promises an MDE it must know how much estimator variance each
  * adjustment buys on ITS metric. Per-user post-period value is the
  * metric Y, pre-period value the CUPED covariate X (split at the
  * calendar midpoint); the table reports, per method, the variance and
  * its reduction against raw:
  *
  *   - `raw`:        Var(Y)
  *   - `cuped`:      Var(Y − θX) = Var(Y) − Cov(X,Y)²/Var(X), computed
  *                   in CLOSED FORM from the same moment pass (no
  *                   second scan with θ applied);
  *   - `winsorized`: Var(min(Y, 2·mean(Y))) — the fixed-multiplier cap
  *                   variant (a deterministic cap; quantile caps are a
  *                   separate query's business), which needs the one
  *                   extra capped pass.
  *
  * Determinism: all moments are DECIMAL-routed sums of per-row doubles
  * snapped on a magnitude-appropriate grid — per-user squares/products
  * reach ~1e10 at sf0.1, so they snap at 1e-2 (x·100 stays exact to
  * ~9e13; snap6 would overflow 2^53 and snap9 is hopeless — the
  * ts_forecast_reconcile lesson applied at design time). The scalar
  * tail is fixed-order IEEE arithmetic on identical inputs.
  *
  * Scale: one daily-window split aggregate per user, one moment
  * aggregate, one capped re-aggregate over the (small) per-user frame;
  * one-row frames broadcast.
  */
object VarianceReduction {

  /** Snap to the 1e-2 grid — for per-row magnitudes up to ~9e13. */
  private def snap2(c: Column): Column = round(c * lit(1e2)) / lit(1e2)
  private def sqlSnap2(e: String): String = s"round(($e) * 1e2) / 1e2"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_variance_reduction",
      Some(s"""
        WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0,
                           MAX(CAST(ts AS DATE)) AS d1 FROM events),
        per_user AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN CAST(ts AS DATE) - d0.d0
                                    < (d0.d1 - d0.d0 + 1) // 2
                               THEN CAST(value AS DECIMAL(18,2))
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS x,
                 CAST(SUM(CASE WHEN CAST(ts AS DATE) - d0.d0
                                    >= (d0.d1 - d0.d0 + 1) // 2
                               THEN CAST(value AS DECIMAL(18,2))
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS y
          FROM events CROSS JOIN d0
          GROUP BY user_id),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(${sqlSnap2("x * x")} AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(${sqlSnap2("y * y")} AS DECIMAL(28,9))) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(${sqlSnap2("x * y")} AS DECIMAL(28,9))) AS DOUBLE) AS sxy
          FROM per_user),
        base AS (
          SELECT n,
                 (syy - sy * sy / n) / (n - 1) AS var_y,
                 (sxx - sx * sx / n) / (n - 1) AS var_x,
                 (sxy - sx * sy / n) / (n - 1) AS cov_xy,
                 2.0 * sy / n AS cap
          FROM mom),
        wins AS (
          SELECT CAST(SUM(CAST(${sqlSnap2(
        "least(y, cap) * least(y, cap)")} AS DECIMAL(28,9))) AS DOUBLE) AS swyy,
                 CAST(SUM(CAST(least(y, cap) AS DECIMAL(28,9))) AS DOUBLE) AS swy
          FROM per_user CROSS JOIN base),
        vars AS (
          SELECT 'raw' AS method, var_y AS variance FROM base
          UNION ALL
          SELECT 'cuped', var_y - cov_xy * cov_xy / var_x FROM base
          UNION ALL
          SELECT 'winsorized', (w.swyy - w.swy * w.swy / b.n) / (b.n - 1)
          FROM wins w, base b)
        SELECT v.method,
               ${det.sqlSnap6("v.variance")} AS variance,
               ${det.sqlSnap9("1.0 - v.variance / b.var_y")} AS reduction
        FROM vars v, base b
        ORDER BY v.method
      """.trim),
      (s, d) => {
        val ev = events(s, d)
        val dd = ev.agg(min(col("ts").cast("date")).as("d0"),
          max(col("ts").cast("date")).as("d1"))
        // integer floor division to match the oracle's `//` — Spark's
        // `/` on ints returns DOUBLE and an odd day span would split
        // the calendar at x.5 on one engine only
        val half = ((datediff(col("d1"), col("d0")) + 1) / 2).cast("int")
        val zero = lit(0).cast(DecimalType(18, 2))
        val perUser = ev.crossJoin(broadcast(dd))
          .groupBy(col("user_id"))
          .agg(
            sum(when(datediff(col("ts").cast("date"), col("d0")) < half,
              col("value").cast(DecimalType(18, 2))).otherwise(zero))
              .cast("double").as("x"),
            sum(when(datediff(col("ts").cast("date"), col("d0")) >= half,
              col("value").cast(DecimalType(18, 2))).otherwise(zero))
              .cast("double").as("y"))
          .localCheckpoint() // moments + the capped winsorized pass
        def dsum(c: Column) = sum(c.cast(DecimalType(28, 9))).cast("double")
        val mom = perUser.agg(
          count(lit(1)).cast("long").as("n"),
          dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
          dsum(snap2(col("x") * col("x"))).as("sxx"),
          dsum(snap2(col("y") * col("y"))).as("syy"),
          dsum(snap2(col("x") * col("y"))).as("sxy"))
        val base = mom.select(col("n"),
          ((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1))
            .as("var_y"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
            .as("var_x"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
            .as("cov_xy"),
          (lit(2.0) * col("sy") / col("n")).as("cap"))
        val wins = perUser.crossJoin(broadcast(base))
          .agg(dsum(snap2(least(col("y"), col("cap"))
            * least(col("y"), col("cap")))).as("swyy"),
            dsum(least(col("y"), col("cap"))).as("swy"))
        val vars = base.select(lit("raw").as("method"),
            col("var_y").as("variance"))
          .unionAll(base.select(lit("cuped").as("method"),
            (col("var_y") - col("cov_xy") * col("cov_xy") / col("var_x"))
              .as("variance")))
          .unionAll(wins.crossJoin(broadcast(base))
            .select(lit("winsorized").as("method"),
              ((col("swyy") - col("swy") * col("swy") / col("n"))
                / (col("n") - 1)).as("variance")))
        vars.crossJoin(broadcast(base.select(col("var_y"))))
          .select(col("method"),
            det.snap6(col("variance")).as("variance"),
            det.snap9(lit(1.0) - col("variance") / col("var_y"))
              .as("reduction"))
          .orderBy(col("method"))
      }))
}
