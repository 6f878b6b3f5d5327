package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Doubly-robust off-policy evaluation (Dudík, Langford & Li,
  * ICML 2011) — the estimator production bandit teams actually ship,
  * because it is consistent if EITHER the propensity model OR the
  * reward model is right:
  *
  *   DR = (1/n) Σᵢ [ V̂(xᵢ) + ρᵢ · (rᵢ − q̂(xᵢ, aᵢ)) ]
  *
  * with context x = user bucket (user_id % 8), logged action a = event
  * type, target policy uniform over the K types, ρ = π/μ̂ against the
  * PER-CONTEXT empirical logging propensities, and the reward model
  * q̂(x, a) fit as empirical means on a DISJOINT split (even event_ids
  * train q̂, odd event_ids are evaluated — fitting and evaluating on
  * the same rows would make the correction term vacuously zero). The
  * direct-method value (mean V̂) and the eval-split IPS value flank the
  * DR estimate — the three-way comparison is how you see WHICH
  * assumption is doing the work (complements `ev_ips_offpolicy`, which
  * reports IPS/SNIPS diagnostics on the full log).
  *
  * Determinism: propensities and q̂ are exact count/decimal-sum ratios;
  * per-row terms are snapped into DECIMAL sums; unseen (x, a) cells
  * coalesce to q̂ = 0 (stated, not silent). Scale: three grouped
  * aggregates over events + broadcast model joins; one moment
  * aggregate.
  */
object DoublyRobust {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_doubly_robust",
      Some(s"""
        WITH base AS (
          SELECT event_id % 2 = 0 AS is_train,
                 CAST(user_id % 8 AS BIGINT) AS x,
                 event_type AS a,
                 CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS r
          FROM events),
        k AS (SELECT CAST(COUNT(DISTINCT a) AS BIGINT) AS n_types FROM base),
        qhat AS (
          SELECT x, a,
                 CAST(SUM(CAST(r AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS q
          FROM base WHERE is_train GROUP BY x, a),
        vhat AS (
          SELECT q.x,
                 CAST(SUM(CAST(${det.sqlSnap9("q.q")} AS DECIMAL(28,12)))
                   AS DOUBLE) / k.n_types AS v
          FROM qhat q CROSS JOIN k GROUP BY q.x, k.n_types),
        mu AS (
          SELECT x, a, COUNT(*) AS c,
                 SUM(COUNT(*)) OVER (PARTITION BY x) AS nx
          FROM base WHERE NOT is_train GROUP BY x, a),
        terms AS (
          SELECT b.r,
                 v.v + (mu.nx * 1.0 / (k.n_types * mu.c))
                     * (b.r - COALESCE(q.q, 0.0)) AS dr_term,
                 (mu.nx * 1.0 / (k.n_types * mu.c)) * b.r AS ips_term,
                 v.v AS dm_term,
                 mu.nx * 1.0 / (k.n_types * mu.c) AS w
          FROM base b
          JOIN mu ON mu.x = b.x AND mu.a = b.a
          JOIN vhat v ON v.x = b.x
          LEFT JOIN qhat q ON q.x = b.x AND q.a = b.a
          CROSS JOIN k
          WHERE NOT b.is_train),
        mo AS (
          SELECT COUNT(*) AS n,
                 CAST(SUM(CAST(${det.sqlSnap9("dr_term")} AS DECIMAL(28,12)))
                   AS DOUBLE) AS sdr,
                 CAST(SUM(CAST(${det.sqlSnap9("ips_term")} AS DECIMAL(28,12)))
                   AS DOUBLE) AS sips,
                 CAST(SUM(CAST(${det.sqlSnap9("dm_term")} AS DECIMAL(28,12)))
                   AS DOUBLE) AS sdm,
                 MAX(${det.sqlSnap9("w")}) AS max_w
          FROM terms)
        SELECT CAST(n AS BIGINT) AS n_eval,
               ${det.sqlSnap9("sdr / n")} AS dr_value,
               ${det.sqlSnap9("sips / n")} AS ips_value,
               ${det.sqlSnap9("sdm / n")} AS dm_value,
               ${det.sqlSnap9("max_w")} AS max_weight
        FROM mo
      """.trim),
      (s, d) => {
        import s.implicits._
        val base = events(s, d)
          .select(($"event_id" % 2 === 0).as("is_train"),
            ($"user_id" % 8).cast("long").as("x"),
            $"event_type".as("a"),
            $"value".cast(DecimalType(18, 2)).cast("double").as("r"))
          .localCheckpoint() // train profile + eval propensities + eval scan
        val k = base.agg(countDistinct($"a").cast("long").as("n_types"))
        val qhat = base.filter($"is_train")
          .groupBy($"x".as("q_x"), $"a".as("q_a"))
          .agg((sum($"r".cast(DecimalType(28, 9))).cast("double")
            / count(lit(1))).as("q"))
        // the one Σ here not previously routed through DECIMAL — a
        // plain double sum is partition-order-dependent and feeds the
        // snapped outputs downstream (r8 advice); snap9 is safe (q is
        // a per-cell mean of event values, |q| < 1e3)
        val vhat = qhat.crossJoin(broadcast(k))
          .groupBy($"q_x".as("v_x"))
          .agg((sum(det.snap9($"q").cast(DecimalType(28, 12))).cast("double")
            / first($"n_types")).as("v"))
        val mu = base.filter(!$"is_train")
          .groupBy($"x".as("m_x"), $"a".as("m_a"))
          .agg(count(lit(1)).as("c"))
          .withColumn("nx", sum($"c").over(
            org.apache.spark.sql.expressions.Window.partitionBy($"m_x")))
        val terms = base.filter(!$"is_train")
          .join(mu, $"x" === $"m_x" && $"a" === $"m_a")
          .join(vhat, $"x" === $"v_x")
          .join(qhat, $"x" === $"q_x" && $"a" === $"q_a", "left")
          .crossJoin(broadcast(k))
          .select(
            ($"v" + ($"nx" * 1.0 / ($"n_types" * $"c"))
              * ($"r" - coalesce($"q", lit(0.0)))).as("dr_term"),
            (($"nx" * 1.0 / ($"n_types" * $"c")) * $"r").as("ips_term"),
            $"v".as("dm_term"),
            ($"nx" * 1.0 / ($"n_types" * $"c")).as("w"))
        val mo = terms.agg(count(lit(1)).as("n"),
          sum(det.snap9($"dr_term").cast(DecimalType(28, 12)))
            .cast("double").as("sdr"),
          sum(det.snap9($"ips_term").cast(DecimalType(28, 12)))
            .cast("double").as("sips"),
          sum(det.snap9($"dm_term").cast(DecimalType(28, 12)))
            .cast("double").as("sdm"),
          max(det.snap9($"w")).as("max_w"))
        mo.select($"n".cast("long").as("n_eval"),
          det.snap9($"sdr" / $"n").as("dr_value"),
          det.snap9($"sips" / $"n").as("ips_value"),
          det.snap9($"sdm" / $"n").as("dm_value"),
          det.snap9($"max_w").as("max_weight"))
      }))
}
