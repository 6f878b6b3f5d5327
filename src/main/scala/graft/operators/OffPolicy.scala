package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Off-policy evaluation by inverse propensity scoring (Horvitz &
  * Thompson 1952; Dudík et al. ICML'11 terminology): the logged
  * "policy" is the observed per-user event-type distribution (its
  * propensities are the empirical type shares); the target policy is
  * uniform over the 5 types. IPS value = mean of w·reward with
  * w = π_target/π_logged, alongside the self-normalized SNIPS
  * estimate (Σw·r / Σw) that trades a little bias for much less
  * variance — the pair every recommender/bandit team reports when
  * judging a new policy from logs WITHOUT an online test. The weight
  * diagnostics (max w, effective sample size) are the health checks
  * that decide whether the estimate is usable at all.
  *
  * Determinism: propensities are exact count ratios; each weighted
  * reward is snapped into DECIMAL sums; the final estimators are
  * fixed-order doubles from those exact sums, snapped.
  *
  * Scale: one shares aggregate (|types| rows, broadcast back) + one
  * weighted-moment aggregate over events — mergeable counters.
  */
object OffPolicy {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_ips_offpolicy",
      Some(s"""
        WITH tot AS (SELECT COUNT(*) AS n FROM events),
        shares AS (
          SELECT event_type, COUNT(*) AS c FROM events GROUP BY event_type),
        k AS (SELECT COUNT(*) AS n_types FROM shares),
        w AS (
          SELECT e.event_type,
                 CAST(e.value AS DECIMAL(18,2)) AS r,
                 -- w = (1/K) / (c/N) = N / (K·c), exact-int ratio
                 CAST(tot.n AS DOUBLE) / (k.n_types * s.c) AS wgt
          FROM events e
          JOIN shares s ON s.event_type = e.event_type
          CROSS JOIN tot CROSS JOIN k),
        mo AS (
          SELECT COUNT(*) AS n,
                 CAST(SUM(CAST(${det.sqlSnap9(
          "wgt * CAST(r AS DOUBLE)")} AS DECIMAL(28,12))) AS DOUBLE) AS swr,
                 CAST(SUM(CAST(${det.sqlSnap9(
          "wgt")} AS DECIMAL(28,12))) AS DOUBLE) AS sw,
                 CAST(SUM(CAST(${det.sqlSnap9(
          "wgt * wgt")} AS DECIMAL(28,12))) AS DOUBLE) AS sw2,
                 MAX(${det.sqlSnap9("wgt")}) AS max_w
          FROM w)
        SELECT CAST(n AS BIGINT) AS n_logged,
               ${det.sqlSnap9("swr / n")} AS ips_value,
               ${det.sqlSnap9("swr / sw")} AS snips_value,
               ${det.sqlSnap9("max_w")} AS max_weight,
               ${det.sqlSnap9("sw * sw / sw2")} AS eff_sample_size
        FROM mo
      """.trim),
      (s, d) => {
        import s.implicits._
        val ev = events(s, d)
        val tot = ev.agg(count(lit(1)).as("n"))
        val shares = ev.groupBy($"event_type".as("s_et"))
          .agg(count(lit(1)).as("c"))
        val k = shares.agg(count(lit(1)).as("n_types"))
        val w = ev
          .join(broadcast(shares), $"event_type" === $"s_et")
          .crossJoin(broadcast(tot)).crossJoin(broadcast(k))
          .select($"event_type", $"value".cast(DecimalType(18, 2)).as("r"),
            ($"n".cast("double") / ($"n_types" * $"c")).as("wgt"))
        val mo = w.agg(count(lit(1)).as("n"),
          sum(det.snap9($"wgt" * $"r".cast("double"))
            .cast(DecimalType(28, 12))).cast("double").as("swr"),
          sum(det.snap9($"wgt").cast(DecimalType(28, 12)))
            .cast("double").as("sw"),
          sum(det.snap9($"wgt" * $"wgt").cast(DecimalType(28, 12)))
            .cast("double").as("sw2"),
          max(det.snap9($"wgt")).as("max_w"))
        mo.select($"n".cast("long").as("n_logged"),
          det.snap9($"swr" / $"n").as("ips_value"),
          det.snap9($"swr" / $"sw").as("snips_value"),
          det.snap9($"max_w").as("max_weight"),
          det.snap9($"sw" * $"sw" / $"sw2").as("eff_sample_size"))
      }))
}
