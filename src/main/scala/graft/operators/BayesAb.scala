package graft.operators

import graft.{det, QueryDef}
import graft.sources.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bayesian A/B readout on conversion — the posterior-probability
  * counterpart to the frequentist `ev_ab_test` / `ev_ab_ttest` pair.
  * Per-user conversion (any purchase >= $150 — a non-saturating
  * definition; every fixture user has SOME purchase) under the same deterministic
  * `user_id % 2` assignment; uniform Beta(1,1) prior, so the posterior
  * is Beta(c+1, n-c+1) per arm with mean (c+1)/(n+2) — exact rationals
  * from exact BIGINT counts. P(B > A) uses the normal approximation of
  * the posterior difference, Phi(z) with z = (pb-pa)/sqrt(va+vb), and
  * Phi is evaluated with the Abramowitz-Stegun 7.1.26 erf polynomial —
  * the SAME Horner-ordered expression in both engines. Every input to
  * the polynomial is derived from integers by a fixed-order double
  * expression; the one libm call (exp) can drift an ulp across
  * builds, so the probability is snapped to the 1e-9 grid before
  * emission and the ship/keep decision branches on the SNAPPED value —
  * identical digits and identical decisions everywhere.
  *
  * Scale: one per-user conversion aggregate (hash groupBy), one
  * 4-counter reduce, then closed-form scalar math on a single row.
  * State never grows past one row per user in the first exchange.
  * Reference: extends the experimentation family per SURVEY §2.
  */
object BayesAb {

  /** A&S 7.1.26 erf approximation (|eps| <= 1.5e-7), Horner order. */
  private[operators] def erfApprox(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736)
      + t * (lit(1.421413741) + t * (lit(-1.453152027)
      + t * lit(1.061405429)))))
    lit(1.0) - poly * exp(-(x * x))
  }

  private[operators] def sqlErf(x: String): String = {
    val t = s"(1.0 / (1.0 + 0.3275911 * ($x)))"
    s"(1.0 - $t * (0.254829592 + $t * (-0.284496736 + $t * (1.421413741 + $t * (-1.453152027 + $t * 1.061405429)))) * exp(-(($x) * ($x))))"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_bayes_ab",
      Some(s"""
        WITH u AS (
          SELECT user_id % 2 AS variant,
                 MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0 THEN 1 ELSE 0 END) AS conv
          FROM events GROUP BY user_id),
        m AS (
          SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
                 SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS ca,
                 SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS cb
          FROM u),
        post AS (
          SELECT na, nb, ca, cb,
                 (ca + 1.0) / (na + 2.0) AS pa,
                 (cb + 1.0) / (nb + 2.0) AS pb,
                 ((ca + 1.0) / (na + 2.0)) * (1.0 - (ca + 1.0) / (na + 2.0)) / (na + 3.0) AS va,
                 ((cb + 1.0) / (nb + 2.0)) * (1.0 - (cb + 1.0) / (nb + 2.0)) / (nb + 3.0) AS vb
          FROM m),
        zt AS (
          SELECT *, (pb - pa) / sqrt(va + vb) AS z,
                 abs((pb - pa) / sqrt(va + vb)) / sqrt(2.0) AS xa
          FROM post),
        pr AS (
          SELECT *,
                 round((CASE WHEN z >= 0 THEN 0.5 * (1.0 + ${sqlErf("xa")})
                             ELSE 0.5 * (1.0 - ${sqlErf("xa")}) END) * 1e9) / 1e9
                   AS prob
          FROM zt)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(ca AS BIGINT) AS conv_a, CAST(cb AS BIGINT) AS conv_b,
               pa AS rate_a, pb AS rate_b, pb - pa AS lift,
               z AS z_score, prob AS prob_b_beats_a,
               CASE WHEN prob > 0.95 THEN 'ship_b'
                    WHEN prob < 0.05 THEN 'ship_a'
                    ELSE 'keep_testing' END AS decision
        FROM pr
      """.trim),
      (s, d) => {
        import s.implicits._
        val u = events(s, d)
          .groupBy($"user_id")
          .agg(max(when($"event_type" === "purchase" && $"value" >= 150.0, 1).otherwise(0)).as("conv"))
          .select(($"user_id" % 2).as("variant"), $"conv")
        val m = u.agg(
          sum(when($"variant" === 0, 1L).otherwise(0L)).as("na"),
          sum(when($"variant" === 1, 1L).otherwise(0L)).as("nb"),
          sum(when($"variant" === 0, $"conv".cast("long")).otherwise(0L)).as("ca"),
          sum(when($"variant" === 1, $"conv".cast("long")).otherwise(0L)).as("cb"))
        val pa = ($"ca" + 1.0) / ($"na" + 2.0)
        val pb = ($"cb" + 1.0) / ($"nb" + 2.0)
        val va = (($"ca" + 1.0) / ($"na" + 2.0)) *
          (lit(1.0) - ($"ca" + 1.0) / ($"na" + 2.0)) / ($"na" + 3.0)
        val vb = (($"cb" + 1.0) / ($"nb" + 2.0)) *
          (lit(1.0) - ($"cb" + 1.0) / ($"nb" + 2.0)) / ($"nb" + 3.0)
        val z = (pb - pa) / sqrt(va + vb)
        val xa = abs(z) / sqrt(lit(2.0))
        val prob = det.snap9(
          when(z >= 0, lit(0.5) * (lit(1.0) + erfApprox(xa)))
            .otherwise(lit(0.5) * (lit(1.0) - erfApprox(xa))))
        m.select($"na".cast("long").as("n_a"), $"nb".cast("long").as("n_b"),
          $"ca".cast("long").as("conv_a"), $"cb".cast("long").as("conv_b"),
          pa.as("rate_a"), pb.as("rate_b"), (pb - pa).as("lift"),
          z.as("z_score"), prob.as("prob_b_beats_a"),
          when(prob > 0.95, "ship_b").when(prob < 0.05, "ship_a")
            .otherwise("keep_testing").as("decision"))
      }))
}
