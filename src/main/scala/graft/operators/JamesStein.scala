package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** James-Stein shrinkage over a multi-arm experiment readout — the
  * winner's-curse guard: with K arms, the naive per-arm conversion
  * rates overstate the best arm (selection bias), and the JS estimator
  * dominates them by shrinking every arm toward the grand mean:
  *
  *   shrunk_k = xbar + (1 - c) * (x_k - xbar)
  *   c = (K - 3) * sigma2 / sum_k (x_k - xbar)^2     (clipped to [0,1])
  *
  * with sigma2 the (common) sampling variance of an arm mean,
  * estimated from the pooled rate: p(1-p)/n_k at the common n (arms
  * are a uniform hash split, so n_k are near-equal; the harness uses
  * the mean arm size — stated, deterministic). Inputs are exact
  * integer counts; the two cross-arm moment sums go through the
  * snap9 -> DECIMAL route (a K-row double SUM is still
  * order-dependent), and everything after is fixed-order double math
  * with no libm calls at all.
  *
  * The readout a launch review wants: per arm, the naive rate, the
  * shrunk rate, and the rank flip risk (does the winner survive
  * shrinkage?) — emitted as is_naive_winner / is_shrunk_winner flags
  * with deterministic (rate, arm) tiebreaks.
  *
  * Scale: one per-user conversion aggregate, one K-row reduce, then
  * scalar math joined back — state bounded by K, not users.
  * Reference scope: extends the experimentation family per SURVEY §2.
  */
object JamesStein {

  private val K = 8

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_james_stein",
      Some(s"""
        WITH u AS (
          SELECT user_id % $K AS arm,
                 MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
                          THEN 1 ELSE 0 END) AS conv
          FROM events GROUP BY user_id),
        a AS (
          SELECT arm, COUNT(*) AS n, SUM(conv) AS c
          FROM u GROUP BY arm),
        g AS (
          SELECT SUM(n) AS ntot, SUM(c) AS ctot,
                 COUNT(*) AS k,
                 CAST(SUM(CAST(round(((CAST(c AS DOUBLE) / n) * (CAST(c AS DOUBLE) / n)) * 1e9) / 1e9 AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(round((CAST(c AS DOUBLE) / n) * 1e9) / 1e9 AS DECIMAL(28,12))) AS DOUBLE) AS sx
          FROM a),
        f AS (
          SELECT ntot, ctot, k, sx / k AS xbar,
                 (CAST(ctot AS DOUBLE) / ntot) * (1.0 - CAST(ctot AS DOUBLE) / ntot)
                   / (CAST(ntot AS DOUBLE) / k) AS sigma2,
                 sxx - sx * sx / k AS ss
          FROM g),
        cf AS (
          SELECT xbar,
                 LEAST(1.0, GREATEST(0.0, (k - 3.0) * sigma2 / ss)) AS c
          FROM f),
        r AS (
          SELECT a.arm, a.n, a.c AS conv,
                 CAST(a.c AS DOUBLE) / a.n AS naive_rate,
                 cf.xbar + (1.0 - cf.c) * (CAST(a.c AS DOUBLE) / a.n - cf.xbar)
                   AS shrunk_rate,
                 cf.c AS shrink_factor
          FROM a CROSS JOIN cf)
        SELECT CAST(arm AS BIGINT) AS arm, CAST(n AS BIGINT) AS n_users,
               CAST(conv AS BIGINT) AS conv,
               naive_rate, shrunk_rate, shrink_factor,
               arm = (SELECT arm FROM r ORDER BY naive_rate DESC, arm LIMIT 1)
                 AS is_naive_winner,
               arm = (SELECT arm FROM r ORDER BY shrunk_rate DESC, arm LIMIT 1)
                 AS is_shrunk_winner
        FROM r
        ORDER BY arm
      """.trim),
      (s, d) => {
        import s.implicits._
        val u = events(s, d)
          .groupBy($"user_id")
          .agg(max(when($"event_type" === "purchase" && $"value" >= 150.0, 1)
            .otherwise(0)).as("conv"))
          .select(($"user_id" % K).as("arm"), $"conv")
        val a = u.groupBy($"arm")
          .agg(count(lit(1)).as("n"), sum($"conv").as("c"))
        import org.apache.spark.sql.types.DecimalType
        val rate = $"c".cast("double") / $"n"
        val g = a.agg(
          sum($"n").as("ntot"), sum($"c").as("ctot"), count(lit(1)).as("k"),
          sum(graft.det.snap9(rate * rate).cast(DecimalType(28, 12)))
            .cast("double").as("sxx"),
          sum(graft.det.snap9(rate).cast(DecimalType(28, 12)))
            .cast("double").as("sx"))
        val f = g.select($"ntot", $"ctot", $"k",
          ($"sx" / $"k").as("xbar"),
          (($"ctot".cast("double") / $"ntot")
            * (lit(1.0) - $"ctot".cast("double") / $"ntot")
            / ($"ntot".cast("double") / $"k")).as("sigma2"),
          ($"sxx" - $"sx" * $"sx" / $"k").as("ss"))
        val cf = f.select($"xbar",
          least(lit(1.0), greatest(lit(0.0),
            ($"k" - 3.0) * $"sigma2" / $"ss")).as("shrink"))
        val r = a.crossJoin(broadcast(cf))
          .select($"arm", $"n", $"c".as("conv"),
            ($"c".cast("double") / $"n").as("naive_rate"),
            ($"xbar" + (lit(1.0) - $"shrink") * ($"c".cast("double") / $"n" - $"xbar"))
              .as("shrunk_rate"),
            $"shrink".as("shrink_factor"))
        // deterministic winner flags via the K-row reduce (broadcast)
        val naiveWin = r.orderBy($"naive_rate".desc, $"arm").limit(1)
          .select($"arm".as("nw"))
        val shrunkWin = r.orderBy($"shrunk_rate".desc, $"arm").limit(1)
          .select($"arm".as("sw"))
        r.crossJoin(broadcast(naiveWin)).crossJoin(broadcast(shrunkWin))
          .select($"arm".cast("long").as("arm"), $"n".cast("long").as("n_users"),
            $"conv".cast("long").as("conv"),
            $"naive_rate", $"shrunk_rate", $"shrink_factor",
            ($"arm" === $"nw").as("is_naive_winner"),
            ($"arm" === $"sw").as("is_shrunk_winner"))
          .orderBy($"arm")
      }))
}
