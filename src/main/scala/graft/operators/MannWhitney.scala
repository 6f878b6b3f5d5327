package graft.operators

import graft.{det, QueryDef}
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric counterpart
  * to the `ev_ab_test` Welch t: compares the full purchase-value
  * DISTRIBUTIONS of the two assignment arms, robust to the heavy right
  * tail purchase values actually have. Everything up to the final z is
  * EXACT integers, and no per-row rank is ever materialized:
  *
  *   - collapse to DISTINCT values first (cnt, cnt_A per value), so
  *     the rank structure lives on the distinct-value table;
  *   - less(v) = rows strictly below v, via the scale-safe
  *     [[Pipeline.globalRunningSum]] (range shards + per-shard
  *     offsets — never a single-partition window; the distinct value
  *     IS the required unique total-order key);
  *   - the doubled-midrank sum over arm A reduces to
  *     R2_A = sum_v cntA(v) * (2*less(v) + cnt(v) + 1), all BIGINT;
  *   - U (doubled) = R2_A - n_A (n_A + 1); tie-corrected variance uses
  *     the exact integer sum of (t^3 - t) over the same value table;
  *   - z and the two-sided p (shared A&S erf polynomial, identical
  *     Horner expression both engines) are fixed-order double math on
  *     those integers; p is snapped to the 1e-9 grid because exp is
  *     the one libm call in the pipeline, and the significance flag
  *     branches on the SNAPPED value.
  *
  * Scale: one hash groupBy to distinct values, one range exchange for
  * the running sum, one 4-counter reduce. The oracle mirrors the same
  * arithmetic with an ordinary cumulative window over distinct values
  * (scale is the oracle's privilege). Reference scope: extends the
  * experimentation family per SURVEY §2.
  */
object MannWhitney {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_mann_whitney",
      Some(s"""
        WITH p AS (
          SELECT user_id % 2 AS variant, value
          FROM events WHERE event_type = 'purchase'),
        g AS (
          SELECT value, COUNT(*) AS cnt,
                 SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS cnta
          FROM p GROUP BY value),
        cum AS (
          SELECT value, cnt, cnta,
                 SUM(cnt) OVER (ORDER BY value
                   ROWS UNBOUNDED PRECEDING) - cnt AS less
          FROM g),
        s AS (
          SELECT SUM(cnta) AS na,
                 SUM(cnt - cnta) AS nb,
                 SUM(cnta * (2 * less + cnt + 1)) AS r2a,
                 SUM(cnt * cnt * cnt - cnt) AS tcorr
          FROM cum),
        u AS (
          SELECT na, nb, r2a, tcorr, na + nb AS n,
                 (r2a - na * (na + 1)) / 2.0 AS ua
          FROM s),
        z AS (
          SELECT na, nb, ua,
                 (ua - na * nb / 2.0)
                   / sqrt(na * nb / 12.0
                          * ((n + 1.0) - CAST(tcorr AS DOUBLE) / (n * (n - 1.0))))
                   AS zval
          FROM u)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               ua AS u_a,
               CAST(na AS DOUBLE) * nb - ua AS u_b,
               ua / (CAST(na AS DOUBLE) * nb) AS auc_a,
               zval AS z_score,
               ${det.sqlSnap9(s"1.0 - ${BayesAb.sqlErf("abs(zval) / sqrt(2.0)")}")}
                 AS p_two_sided,
               ${det.sqlSnap9(s"1.0 - ${BayesAb.sqlErf("abs(zval) / sqrt(2.0)")}")}
                 < 0.05 AS significant
        FROM z
      """.trim),
      (s, d) => {
        import s.implicits._
        val p = events(s, d)
          .filter($"event_type" === "purchase")
          .select(($"user_id" % 2).as("variant"), $"value")
        val g = p.groupBy($"value")
          .agg(count(lit(1)).as("cnt"),
            sum(when($"variant" === 0, 1L).otherwise(0L)).as("cnta"))
        // rows strictly below each value: scale-safe running sum over
        // the distinct-value table (value is the unique total order)
        val cum = Pipeline.globalRunningSum(g, Seq($"value"), $"cnt")
          .withColumn("less", $"run_sum" - $"cnt")
        val sAgg = cum.agg(
          sum($"cnta").as("na"),
          sum($"cnt" - $"cnta").as("nb"),
          sum($"cnta" * (lit(2) * $"less" + $"cnt" + 1)).as("r2a"),
          sum($"cnt" * $"cnt" * $"cnt" - $"cnt").as("tcorr"))
        val u = sAgg
          .withColumn("n", $"na" + $"nb")
          .withColumn("ua", ($"r2a" - $"na" * ($"na" + 1)) / 2.0)
        val zval = ($"ua" - $"na" * $"nb" / 2.0) /
          sqrt($"na" * $"nb" / 12.0 *
            (($"n" + 1.0) - $"tcorr".cast("double") / ($"n" * ($"n" - 1.0))))
        val pTwo = det.snap9(lit(1.0)
          - BayesAb.erfApprox(abs(zval) / sqrt(lit(2.0))))
        u.select($"na".cast("long").as("n_a"), $"nb".cast("long").as("n_b"),
          $"ua".as("u_a"),
          ($"na".cast("double") * $"nb" - $"ua").as("u_b"),
          ($"ua" / ($"na".cast("double") * $"nb")).as("auc_a"),
          zval.as("z_score"),
          pTwo.as("p_two_sided"),
          (pTwo < 0.05).as("significant"))
      }))
}
