package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-data privacy audit — the gate a training-data pipeline
  * runs before releasing or training on records with quasi-identifiers
  * (Sweeney, "k-Anonymity" 2002; Machanavajjhala et al., "l-Diversity"
  * 2007). `ta_pii_redaction` handles free text; this family handles the
  * tabular side: how re-identifiable are customers from
  * (nation, segment), and does generalizing the quasi-identifier ladder
  * (nation → region → segment-only → public) reach k-anonymity, and at
  * what utility cost?
  *
  * Scale shape: everything derives from ONE fine-grained aggregate
  * `base` = counts at (nation, segment, balance-bucket) — ≤ |nations| ×
  * |segments| × |buckets| rows regardless of input size. Class sizes
  * and l-diversity at every generalization level ROLL UP from `base`
  * (region is functionally determined by nation, so coarser classes
  * are unions of finer ones): one wide shuffle on the fine keys, then
  * driver-sized rollups — the same one-pass-then-rollup discipline as
  * dq_profile.
  */
object Privacy {

  private val K = 10 // k-anonymity threshold
  private val KBAL = 100 // sensitive-attribute bucket width (acctbal)

  val defs: Seq[QueryDef] = Seq(

    // Generalization ladder: for each level of quasi-identifier
    // coarsening report class count, worst (minimum) class size, rows
    // at re-identification risk (in classes smaller than K) and the
    // worst l-diversity of the bucketed sensitive attribute. The
    // operator answers "which rung of the ladder first reaches
    // k = 10" — here the raw (nation, segment) grid is already risky
    // while region-level generalization is not, which is exactly the
    // decision the audit exists to surface.
    QueryDef(
      "dq_k_anonymity",
      Some(s"""
        WITH base AS (
          SELECT c.c_nationkey AS nat, n.n_regionkey AS reg,
                 c.c_mktsegment AS seg,
                 CAST(floor(c.c_acctbal / $KBAL) AS BIGINT) AS bal_bucket,
                 COUNT(*) AS cnt
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2, 3, 4),
        l0 AS (
          SELECT 'L0_nation_segment' AS level, nat AS k1, seg AS k2,
                 SUM(cnt) AS sz, COUNT(DISTINCT bal_bucket) AS ldiv
          FROM base GROUP BY 2, 3),
        l1 AS (
          SELECT 'L1_region_segment' AS level, reg AS k1, seg AS k2,
                 SUM(cnt) AS sz, COUNT(DISTINCT bal_bucket) AS ldiv
          FROM base GROUP BY 2, 3),
        l2 AS (
          SELECT 'L2_segment' AS level, CAST(-1 AS BIGINT) AS k1, seg AS k2,
                 SUM(cnt) AS sz, COUNT(DISTINCT bal_bucket) AS ldiv
          FROM base GROUP BY 3),
        l3 AS (
          SELECT 'L3_public' AS level, CAST(-1 AS BIGINT) AS k1, '*' AS k2,
                 SUM(cnt) AS sz, COUNT(DISTINCT bal_bucket) AS ldiv
          FROM base),
        classes AS (
          SELECT * FROM l0 UNION ALL SELECT * FROM l1
          UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3)
        SELECT level,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(MIN(sz) AS BIGINT) AS min_class_size,
               CAST(SUM(CASE WHEN sz < $K THEN sz ELSE 0 END) AS BIGINT)
                 AS n_at_risk,
               ${det.sqlSnap9(s"SUM(CASE WHEN sz < $K THEN sz ELSE 0 END) * 1.0 / SUM(sz)")}
                 AS risk_frac,
               CAST(MIN(ldiv) AS BIGINT) AS min_l_diversity
        FROM classes
        GROUP BY level
        ORDER BY level
      """.trim),
      (s, d) => {
        val base = customer(s, d)
          .join(nation(s, d),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_nationkey").as("nat"),
            col("n_regionkey").as("reg"), col("c_mktsegment").as("seg"),
            floor(col("c_acctbal") / KBAL).cast("long").as("bal_bucket"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // four rollups read it; ≤ |nat|·|seg|·|bucket| rows
        def level(name: String, k1: org.apache.spark.sql.Column,
            k2: org.apache.spark.sql.Column): DataFrame =
          base.groupBy(k1.as("k1"), k2.as("k2"))
            .agg(sum(col("cnt")).as("sz"),
              countDistinct(col("bal_bucket")).as("ldiv"))
            .select(lit(name).as("level"), col("sz"), col("ldiv"))
        val classes =
          level("L0_nation_segment", col("nat"), col("seg"))
            .unionByName(level("L1_region_segment", col("reg"), col("seg")))
            .unionByName(level("L2_segment", lit(-1L), col("seg")))
            .unionByName(level("L3_public", lit(-1L), lit("*")))
        classes.groupBy(col("level"))
          .agg(count(lit(1)).as("n_classes"),
            min(col("sz")).cast("long").as("min_class_size"),
            sum(when(col("sz") < K, col("sz")).otherwise(0L)).cast("long")
              .as("n_at_risk"),
            det.snap9(sum(when(col("sz") < K, col("sz")).otherwise(0L)) * 1.0
              / sum(col("sz"))).as("risk_frac"),
            min(col("ldiv")).cast("long").as("min_l_diversity"))
          .orderBy(col("level"))
      }))
}
