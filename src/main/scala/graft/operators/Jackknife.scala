package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketed (delete-one-group) jackknife confidence interval for a
  * ratio metric, per A/B arm — the standard way large experimentation
  * platforms get honest variance for ratio metrics (revenue per
  * active user), where the naive per-user i.i.d. SE is wrong because
  * the denominator is random too. Users are hashed into B=25 buckets
  * within each arm; the jackknife resamples whole buckets:
  * R_i = leave-bucket-i-out ratio, Var = (B−1)/B · Σ(R_i − R̄)².
  *
  * Determinism: per-bucket numerators are cent-scaled DECIMAL sums →
  * BIGINT; denominators are distinct-user counts (exact since the
  * bucket key partitions users); each R_i is one fixed-order double
  * expression snapped to the 1e-9 grid, after which the B-term mean
  * and squared-deviation folds run in DECIMAL via the exact-centering
  * trick (dev_i = B·q_i − Σq, all decimal).
  *
  * Scale: ONE hash aggregate to (arm, bucket) granularity — 50 rows —
  * then driver-free 25-row folds per arm. The whole point of the
  * bucketed jackknife at 100 TB: per-user state never leaves the
  * map-side combine, and the resample algebra runs on B rows, not N.
  */
object Jackknife {

  private val B = 25

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_bucket_jackknife",
      Some(s"""
        WITH ub AS (
          SELECT user_id % 2 AS arm, (user_id // 2) % $B AS bucket,
                 user_id,
                 SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS rev
          FROM events GROUP BY 1, 2, 3),
        bk AS (
          SELECT arm, bucket,
                 CAST(SUM(rev) * 100 AS BIGINT) AS v,
                 COUNT(*) AS n
          FROM ub GROUP BY arm, bucket),
        tot AS (
          SELECT arm, SUM(v) AS sv, SUM(n) AS sn, COUNT(*) AS nb
          FROM bk GROUP BY arm),
        loo AS (
          SELECT b.arm, t.sv, t.sn, t.nb,
                 CAST(${det.sqlSnap9(
          "(t.sv - b.v) / (100.0 * (t.sn - b.n))")} AS DECIMAL(28,12)) AS q
          FROM bk b JOIN tot t ON t.arm = b.arm),
        m AS (
          SELECT arm, MAX(sv) AS sv, MAX(sn) AS sn, MAX(nb) AS nb,
                 SUM(q) AS sq
          FROM loo GROUP BY arm),
        dev AS (
          -- the deviation is narrowed to DECIMAL(18,12) BEFORE squaring so
          -- the product stays within exact decimal range in both engines
          SELECT l.arm, m.sv, m.sn, m.nb,
                 CAST(CAST(m.nb AS DECIMAL(4,0)) * l.q - m.sq AS DECIMAL(18,12))
                   * CAST(CAST(m.nb AS DECIMAL(4,0)) * l.q - m.sq AS DECIMAL(18,12)) AS d2
          FROM loo l JOIN m ON m.arm = l.arm),
        fin AS (
          SELECT arm, MAX(sv) AS sv, MAX(sn) AS sn, MAX(nb) AS nb,
                 CAST(SUM(d2) AS DOUBLE) AS sd2
          FROM dev GROUP BY arm),
        snapped AS (
          -- once ratio/se sit on the 1e-9 grid they are EXACT as
          -- DECIMAL(28,12); the ±1.96·se interval algebra then runs in
          -- decimal so neither engine re-rounds a near-midpoint double
          SELECT arm, sn,
                 CAST(${det.sqlSnap9("sv / (100.0 * sn)")} AS DECIMAL(28,12)) AS ratio,
                 CAST(${det.sqlSnap9(
          "sqrt(((nb - 1.0) / nb) * sd2 / (CAST(nb AS DOUBLE) * nb))")} AS DECIMAL(28,12)) AS se
          FROM fin)
        SELECT CAST(arm AS BIGINT) AS arm,
               CAST(sn AS BIGINT) AS n_users,
               CAST(ratio AS DOUBLE) AS ratio,
               CAST(se AS DOUBLE) AS se,
               CAST(ratio - CAST('1.96' AS DECIMAL(3,2)) * se AS DOUBLE) AS ci_lo,
               CAST(ratio + CAST('1.96' AS DECIMAL(3,2)) * se AS DOUBLE) AS ci_hi
        FROM snapped
        ORDER BY arm
      """.trim),
      (s, d) => {
        import s.implicits._
        val ub = events(s, d)
          .groupBy(($"user_id" % 2).as("arm"),
            (expr("user_id div 2") % B).as("bucket"), $"user_id")
          .agg(sum(when($"event_type" === "purchase",
            $"value".cast(DecimalType(18, 2)))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).as("rev"))
        val bk = ub.groupBy($"arm", $"bucket")
          .agg((sum($"rev") * 100).cast("long").as("v"),
            count(lit(1)).as("n"))
        val tot = bk.groupBy($"arm".as("t_arm"))
          .agg(sum($"v").as("sv"), sum($"n").as("sn"), count(lit(1)).as("nb"))
        val loo = bk.join(tot, $"arm" === $"t_arm")
          .select($"arm", $"sv", $"sn", $"nb",
            det.snap9(($"sv" - $"v") / (lit(100.0) * ($"sn" - $"n")))
              .cast(DecimalType(28, 12)).as("q"))
        val m = loo.groupBy($"arm".as("m_arm"))
          .agg(max($"sv").as("m_sv"), max($"sn").as("m_sn"),
            max($"nb").as("m_nb"), sum($"q").as("sq"))
        val dev = loo.join(m, $"arm" === $"m_arm")
          .select($"arm", $"m_sv".as("sv"), $"m_sn".as("sn"),
            $"m_nb".as("nb"),
            (($"m_nb".cast(DecimalType(4, 0)) * $"q" - $"sq")
              .cast(DecimalType(18, 12))
              * ($"m_nb".cast(DecimalType(4, 0)) * $"q" - $"sq")
              .cast(DecimalType(18, 12))).as("d2"))
        val fin = dev.groupBy($"arm")
          .agg(max($"sv").as("sv"), max($"sn").as("sn"),
            max($"nb").as("nb"), sum($"d2").cast("double").as("sd2"))
        val snapped = fin.select($"arm", $"sn",
          det.snap9($"sv" / (lit(100.0) * $"sn"))
            .cast(DecimalType(28, 12)).as("ratio"),
          det.snap9(sqrt((($"nb" - lit(1.0)) / $"nb") * $"sd2"
            / ($"nb".cast("double") * $"nb")))
            .cast(DecimalType(28, 12)).as("se"))
        val z = lit("1.96").cast(DecimalType(3, 2))
        snapped.select($"arm".cast("long").as("arm"),
            $"sn".cast("long").as("n_users"),
            $"ratio".cast("double").as("ratio"),
            $"se".cast("double").as("se"),
            ($"ratio" - z * $"se").cast("double").as("ci_lo"),
            ($"ratio" + z * $"se").cast("double").as("ci_hi"))
          .orderBy($"arm")
      }))
}
