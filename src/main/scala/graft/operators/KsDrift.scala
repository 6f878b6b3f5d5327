package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Two-sample Kolmogorov–Smirnov drift screen, one-vs-rest per event
  * type: D = max |ECDF_type − ECDF_rest| evaluated on a fixed 100-cell
  * integer grid over the global value range, with the large-sample
  * critical value c(0.05)·√((n+m)/nm), c(0.05) = 1.358 (Smirnov's
  * asymptotic). Complements `ev_psi`/`ta_js_*` (binned divergences
  * weight the whole distribution; KS is the sup-norm screen that
  * catches a localized shift those can average away).
  *
  * Binned, deliberately: the exact KS needs each sample's order
  * statistics — a corpus-wide sort per group — while the 100-cell grid
  * costs one hash aggregate and bounds D's discretization error at the
  * grid resolution (D is attained at a grid point for step functions
  * evaluated on the grid). Bin ids are EXACT integer arithmetic on
  * cent-scaled values — no double boundary can flip a row's bin across
  * engines.
  *
  * Scale: one groupBy(type, bin) over events; everything after runs on
  * the ≤ |types|×100 dense grid (windows partitioned by type, 100 rows
  * each).
  */
object KsDrift {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_ks_drift",
      Some(s"""
        WITH ev AS (
          SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
          FROM events),
        rng AS (SELECT MIN(vc) AS lo, MAX(vc) AS hi FROM ev),
        binned AS (
          SELECT event_type,
                 LEAST(99, ((vc - lo) * 100) // (hi - lo + 1)) AS bin
          FROM ev CROSS JOIN rng),
        cnt AS (
          SELECT event_type, bin, COUNT(*) AS c
          FROM binned GROUP BY 1, 2),
        grid AS (
          SELECT t.event_type, b.bin, COALESCE(c.c, 0) AS c
          FROM (SELECT DISTINCT event_type FROM cnt) t
          CROSS JOIN (SELECT UNNEST(range(0, 100)) AS bin) b
          LEFT JOIN cnt c ON c.event_type = t.event_type AND c.bin = b.bin),
        cum AS (
          SELECT event_type, bin,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum_t,
                 SUM(c) OVER (PARTITION BY event_type) AS n_t
          FROM grid),
        tot AS (
          SELECT bin, SUM(c) AS cg FROM grid GROUP BY bin),
        gcum AS (
          SELECT bin, SUM(cg) OVER (ORDER BY bin) AS cum_g,
                 SUM(cg) OVER () AS n_g
          FROM tot),
        dstat AS (
          SELECT c.event_type, CAST(c.n_t AS BIGINT) AS n,
                 CAST(g.n_g - c.n_t AS BIGINT) AS n_rest,
                 MAX(abs(c.cum_t * 1.0 / c.n_t
                   - (g.cum_g - c.cum_t) * 1.0 / (g.n_g - c.n_t))) AS d
          FROM cum c JOIN gcum g ON c.bin = g.bin
          GROUP BY c.event_type, c.n_t, g.n_g)
        SELECT event_type, n, n_rest,
               ${det.sqlSnap9("d")} AS d_stat,
               ${det.sqlSnap9(
        "1.358 * sqrt((n + n_rest) * 1.0 / (n * 1.0 * n_rest))")} AS crit_05,
               d > 1.358 * sqrt((n + n_rest) * 1.0 / (n * 1.0 * n_rest))
                 AS drifted
        FROM dstat
        ORDER BY event_type
      """.trim),
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_type"),
            (col("value").cast(DecimalType(18, 2)) * 100)
              .cast("long").as("vc"))
        val rng = ev.agg(min(col("vc")).as("lo"), max(col("vc")).as("hi"))
        val cnt = ev.crossJoin(broadcast(rng))
          // `div`, not `/`: Spark's `/` on longs returns DOUBLE and a
          // boundary value could land in a different bin than the
          // oracle's integer `//`
          .select(col("event_type"),
            expr("least(99L, ((vc - lo) * 100) div (hi - lo + 1))")
              .cast("long").as("bin"))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // dense grid + per-type and global cums
        val types = cnt.select(col("event_type")).distinct()
        val bins = s.range(0, 100).select(col("id").as("bin"))
        val grid = types.crossJoin(broadcast(bins))
          .join(cnt, Seq("event_type", "bin"), "left")
          .select(col("event_type"), col("bin"),
            coalesce(col("c"), lit(0L)).as("c"))
        val wCum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
        val wTot = Window.partitionBy(col("event_type"))
        val cum = grid
          .withColumn("cum_t", sum(col("c")).over(wCum))
          .withColumn("n_t", sum(col("c")).over(wTot))
        val gcum = grid.groupBy(col("bin")).agg(sum(col("c")).as("cg"))
          .withColumn("cum_g", sum(col("cg")).over(Window.orderBy(col("bin"))))
          .crossJoin(broadcast(grid.agg(sum(col("c")).as("n_g"))))
        val dstat = cum.join(gcum, "bin")
          .groupBy(col("event_type"), col("n_t"), col("n_g"))
          .agg(max(abs(col("cum_t") * 1.0 / col("n_t")
            - (col("cum_g") - col("cum_t")) * 1.0
              / (col("n_g") - col("n_t")))).as("d"))
        val crit = lit(1.358) * sqrt((col("n") + col("n_rest")) * 1.0
          / (col("n") * 1.0 * col("n_rest")))
        dstat.select(col("event_type"),
            col("n_t").cast("long").as("n"),
            (col("n_g") - col("n_t")).cast("long").as("n_rest"),
            col("d"))
          .select(col("event_type"), col("n"), col("n_rest"),
            det.snap9(col("d")).as("d_stat"),
            det.snap9(crit).as("crit_05"),
            (col("d") > crit).as("drifted"))
          .orderBy(col("event_type"))
      }))
}
