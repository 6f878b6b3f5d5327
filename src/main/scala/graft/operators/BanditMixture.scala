package graft.operators

import graft.{det, QueryDef}
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** UCB1 source-mixture allocation — the adaptive data-mixing step of a
  * training pipeline (DoReMi-style loops): treat each corpus source as
  * a bandit arm whose reward is the per-doc quality-gate pass rate,
  * score each arm with the UCB1 upper confidence bound
  *
  *   ucb_s = mean_s + sqrt(2 ln(T) / n_s)
  *
  * (T = total docs observed, n_s = arm pulls), and allocate the next
  * epoch's ingestion budget proportional to the positive UCB mass.
  * Exploration falls out of the bound: small sources get wide bonuses
  * even when their observed quality trails — exactly the
  * keep-sampling-the-tail behavior a curation loop needs so rare
  * sources aren't starved by an early bad batch.
  *
  * Determinism: means are exact integer ratios; ln/sqrt feed snap9'd
  * scores (ln is libm); the normalized shares are ratios of SNAPPED
  * scores, snapped again — identical digits and identical top-arm
  * choice (flag tiebreak (score, source)) in both engines.
  *
  * The quality gate is the same n_chars band the curation family uses:
  * reward = 1 iff 200 <= n_chars < 1500 (mirrors pl_* length gates).
  *
  * Scale: one per-source aggregate, one 20-row reduce, scalar math —
  * state bounded by the source count. Reference scope: extends the
  * curation-pipeline family per SURVEY §2.
  */
object BanditMixture {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_bandit_mixture",
      Some(s"""
        WITH a AS (
          SELECT source, COUNT(*) AS n,
                 SUM(CASE WHEN n_chars >= 200 AND n_chars < 1500
                          THEN 1 ELSE 0 END) AS r
          FROM documents GROUP BY source),
        t AS (SELECT SUM(n) AS tot FROM a),
        s AS (
          SELECT a.source, a.n, a.r,
                 CAST(a.r AS DOUBLE) / a.n AS mean_reward,
                 ${det.sqlSnap9("CAST(a.r AS DOUBLE) / a.n + sqrt(2.0 * ln(CAST(t.tot AS DOUBLE)) / a.n)")}
                   AS ucb
          FROM a CROSS JOIN t),
        z AS (
          SELECT SUM(CAST(GREATEST(ucb, 0.0) AS DECIMAL(28,12))) AS mass FROM s)
        SELECT s.source,
               CAST(s.n AS BIGINT) AS n_docs,
               CAST(s.r AS BIGINT) AS n_pass,
               s.mean_reward,
               s.ucb AS ucb_score,
               ${det.sqlSnap9("GREATEST(s.ucb, 0.0) / CAST(z.mass AS DOUBLE)")}
                 AS next_share,
               s.ucb = (SELECT MAX(ucb) FROM s) AND
               s.source = (SELECT MIN(source) FROM s s2 WHERE s2.ucb = (SELECT MAX(ucb) FROM s))
                 AS is_lead_arm
        FROM s CROSS JOIN z
        ORDER BY s.source
      """.trim),
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.types.DecimalType
        val a = documents(s, d).groupBy($"source")
          .agg(count(lit(1)).as("n"),
            sum(when($"n_chars" >= 200 && $"n_chars" < 1500, 1L).otherwise(0L))
              .as("r"))
        val t = a.agg(sum($"n").as("tot"))
        val scored = a.crossJoin(broadcast(t))
          .select($"source", $"n", $"r",
            ($"r".cast("double") / $"n").as("mean_reward"),
            det.snap9($"r".cast("double") / $"n"
              + sqrt(lit(2.0) * log($"tot".cast("double")) / $"n")).as("ucb"))
        val mass = scored
          .agg(sum(greatest($"ucb", lit(0.0)).cast(DecimalType(28, 12))).as("mass"))
        val lead = scored.orderBy($"ucb".desc, $"source").limit(1)
          .select($"source".as("lead"))
        scored.crossJoin(broadcast(mass)).crossJoin(broadcast(lead))
          .select($"source",
            $"n".cast("long").as("n_docs"),
            $"r".cast("long").as("n_pass"),
            $"mean_reward",
            $"ucb".as("ucb_score"),
            det.snap9(greatest($"ucb", lit(0.0)) / $"mass".cast("double"))
              .as("next_share"),
            ($"source" === $"lead").as("is_lead_arm"))
          .orderBy($"source")
      }))
}
