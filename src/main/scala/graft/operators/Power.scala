package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Experiment power analysis — the companion readout to
  * [[Experiments]]'s ev_ab_test: given the measured per-arm variances
  * and sample sizes, what's the minimal detectable effect at
  * two-sided α = 0.05 and 80 % power, and is the observed lift above
  * it? MDE = (z_{α/2} + z_{power})·√(s²_a/n_a + s²_b/n_b) with the z
  * quantiles as shared literals (1.959964, 0.841621) so both engines
  * evaluate the identical fixed-order double expression over the same
  * DECIMAL-exact moments. Same single-pass conditional aggregate as
  * the t-test: one row of state, no per-user join.
  */
object Power {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_ab_power",
      Some("""
        WITH p AS (
          SELECT user_id % 2 AS variant,
                 CAST(value AS DECIMAL(28,10)) AS dv,
                 CAST(value * value AS DECIMAL(38,10)) AS dv2
          FROM events WHERE event_type = 'purchase'),
        m AS (
          SELECT
            SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS na,
            SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS nb,
            CAST(SUM(CASE WHEN variant = 0 THEN dv END) AS DOUBLE) AS sa,
            CAST(SUM(CASE WHEN variant = 1 THEN dv END) AS DOUBLE) AS sb,
            CAST(SUM(CASE WHEN variant = 0 THEN dv2 END) AS DOUBLE) AS qa,
            CAST(SUM(CASE WHEN variant = 1 THEN dv2 END) AS DOUBLE) AS qb
          FROM p)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               sa / na AS mean_a, sb / nb AS mean_b,
               (1.959964 + 0.841621)
                 * sqrt(((qa - sa * sa / na) / (na - 1)) / na
                      + ((qb - sb * sb / nb) / (nb - 1)) / nb) AS mde_abs,
               ((1.959964 + 0.841621)
                 * sqrt(((qa - sa * sa / na) / (na - 1)) / na
                      + ((qb - sb * sb / nb) / (nb - 1)) / nb)) / (sa / na) AS mde_rel,
               abs(sa / na - sb / nb)
                 > (1.959964 + 0.841621)
                 * sqrt(((qa - sa * sa / na) / (na - 1)) / na
                      + ((qb - sb * sb / nb) / (nb - 1)) / nb) AS powered
        FROM m
      """.trim),
      (s, d) => {
        import s.implicits._
        val p = events(s, d)
          .filter($"event_type" === "purchase")
          .select(($"user_id" % 2).as("variant"),
            $"value".cast(DecimalType(28, 10)).as("dv"),
            ($"value" * $"value").cast(DecimalType(38, 10)).as("dv2"))
        val m = p.agg(
          sum(when($"variant" === 0, 1).otherwise(0)).as("na"),
          sum(when($"variant" === 1, 1).otherwise(0)).as("nb"),
          sum(when($"variant" === 0, $"dv")).cast("double").as("sa"),
          sum(when($"variant" === 1, $"dv")).cast("double").as("sb"),
          sum(when($"variant" === 0, $"dv2")).cast("double").as("qa"),
          sum(when($"variant" === 1, $"dv2")).cast("double").as("qb"))
        val meanA = $"sa" / $"na"
        val meanB = $"sb" / $"nb"
        val varA = ($"qa" - $"sa" * $"sa" / $"na") / ($"na" - 1)
        val varB = ($"qb" - $"sb" * $"sb" / $"nb") / ($"nb" - 1)
        val mde = (lit(1.959964) + lit(0.841621)) * sqrt(varA / $"na" + varB / $"nb")
        m.select($"na".cast("long").as("n_a"), $"nb".cast("long").as("n_b"),
          meanA.as("mean_a"), meanB.as("mean_b"),
          mde.as("mde_abs"), (mde / meanA).as("mde_rel"),
          (abs(meanA - meanB) > mde).as("powered"))
      }))
}
