package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Switchback (time-sliced) experiment analysis (Bojinov, Simchi-Levi
  * & Zhao, Mgmt Sci 2022): when treatment can't be user-randomized
  * (marketplace pricing, dispatch policy), the whole system flips arm
  * every interval — here odd/even hour. Carryover from the previous
  * arm contaminates an interval's start, so the estimator drops a
  * burn-in prefix (first 10 minutes of each hour) and the interesting
  * diagnostic is how much the per-arm means move once it's dropped —
  * reported per arm, with a row-99 summary carrying the naive and the
  * burn-in-adjusted arm contrasts.
  *
  * Determinism: event values fold as cent-scaled DECIMAL; means are
  * exact-sum / count doubles snapped; the summary contrasts re-derive
  * from the same exact sums.
  *
  * Scale: ONE hash aggregate to the two arms (four counters each) —
  * the estimator is mergeable counters however large the stream.
  */
object Switchback {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_switchback",
      Some(s"""
        WITH e AS (
          SELECT (epoch_us(ts) // 3600000000) % 2 AS arm,
                 CASE WHEN (epoch_us(ts) % 3600000000) >= 600000000
                      THEN 1 ELSE 0 END AS core,
                 CAST(value AS DECIMAL(18,2)) AS v
          FROM events),
        g AS (
          SELECT arm,
                 COUNT(*) AS n_all,
                 CAST(SUM(v) * 100 AS BIGINT) AS s_all,
                 SUM(core) AS n_core,
                 CAST(SUM(CASE WHEN core = 1 THEN v
                          ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS s_core
          FROM e GROUP BY arm)
        SELECT CAST(arm AS BIGINT) AS arm,
               CAST(n_all AS BIGINT) AS n_all,
               ${det.sqlSnap9("s_all / (100.0 * n_all)")} AS mean_all,
               CAST(n_core AS BIGINT) AS n_core,
               ${det.sqlSnap9("s_core / (100.0 * n_core)")} AS mean_core
        FROM g
        UNION ALL
        SELECT CAST(99 AS BIGINT), CAST(SUM(n_all) AS BIGINT),
               ${det.sqlSnap9(
          "SUM(CASE WHEN arm = 1 THEN s_all ELSE 0 END)" +
            " / (100.0 * SUM(CASE WHEN arm = 1 THEN n_all ELSE 0 END))" +
            " - SUM(CASE WHEN arm = 0 THEN s_all ELSE 0 END)" +
            " / (100.0 * SUM(CASE WHEN arm = 0 THEN n_all ELSE 0 END))")},
               CAST(SUM(n_core) AS BIGINT),
               ${det.sqlSnap9(
          "SUM(CASE WHEN arm = 1 THEN s_core ELSE 0 END)" +
            " / (100.0 * SUM(CASE WHEN arm = 1 THEN n_core ELSE 0 END))" +
            " - SUM(CASE WHEN arm = 0 THEN s_core ELSE 0 END)" +
            " / (100.0 * SUM(CASE WHEN arm = 0 THEN n_core ELSE 0 END))")}
        FROM g
        ORDER BY arm
      """.trim),
      (s, d) => {
        import s.implicits._
        val e = events(s, d).select(
          (expr("unix_micros(ts) div 3600000000") % 2).as("arm"),
          when(expr("unix_micros(ts) % 3600000000") >= 600000000L, 1)
            .otherwise(0).as("core"),
          $"value".cast(DecimalType(18, 2)).as("v"))
        val g = e.groupBy($"arm")
          .agg(count(lit(1)).as("n_all"),
            (sum($"v") * 100).cast("long").as("s_all"),
            sum($"core").as("n_core"),
            (sum(when($"core" === 1, $"v")
              .otherwise(lit(0).cast(DecimalType(18, 2)))) * 100)
              .cast("long").as("s_core"))
        val arms = g.select($"arm".cast("long").as("arm"),
          $"n_all".cast("long").as("n_all"),
          det.snap9($"s_all" / (lit(100.0) * $"n_all")).as("mean_all"),
          $"n_core".cast("long").as("n_core"),
          det.snap9($"s_core" / (lit(100.0) * $"n_core")).as("mean_core"))
        def armSum(c: String, a: Int) =
          sum(when($"arm" === a, col(c)).otherwise(0L))
        val summary = g.agg(
          lit(99L).as("arm"),
          sum($"n_all").cast("long").as("n_all"),
          det.snap9(armSum("s_all", 1) / (lit(100.0) * armSum("n_all", 1))
            - armSum("s_all", 0) / (lit(100.0) * armSum("n_all", 0)))
            .as("mean_all"),
          sum($"n_core").cast("long").as("n_core"),
          det.snap9(armSum("s_core", 1) / (lit(100.0) * armSum("n_core", 1))
            - armSum("s_core", 0) / (lit(100.0) * armSum("n_core", 0)))
            .as("mean_core"))
          .select($"arm", $"n_all", $"mean_all", $"n_core", $"mean_core")
        arms.unionByName(summary).orderBy($"arm")
      }))
}
