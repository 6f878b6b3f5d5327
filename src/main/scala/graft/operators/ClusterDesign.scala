package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cluster-randomized design diagnostics (Donner & Klar, "Design and
  * Analysis of Cluster Randomization Trials"; Kish's design effect):
  * when an experiment randomizes USERS but analyzes EVENTS, the
  * effective sample size shrinks by DEFF = 1 + (m̄ − 1)·ICC — ignoring
  * it is the classic way an event-level t-test overstates power. The
  * query computes the one-way-ANOVA ICC of event value within user
  * clusters and the resulting design effect / effective N — the number
  * an experimentation platform must apply before promising an MDE
  * (complements `ev_mde_planning`, which assumes independent units).
  *
  *   SSB = Σᵢ sᵢ²/nᵢ − S²/N,  SSW = Σy² − Σᵢ sᵢ²/nᵢ
  *   MSB = SSB/(k−1),        MSW = SSW/(N−k)
  *   n0  = (N − Σnᵢ²/N)/(k−1)      (ANOVA-balanced cluster size)
  *   ICC = (MSB − MSW)/(MSB + (n0−1)·MSW)
  *   DEFF = 1 + (N/k − 1)·ICC,  N_eff = N/DEFF
  *
  * Determinism: every Σ routes through DECIMAL (per-row/per-cluster
  * doubles snapped on the 1e-6 grid first — sᵢ²/nᵢ reaches ~1e7, far
  * inside snap6's 9e9 bound and far OUTSIDE snap9's); the scalar tail
  * is fixed-order IEEE arithmetic on identical inputs. Scale: one
  * per-user aggregate + one corpus aggregate, crossJoined one-row
  * frames only.
  */
object ClusterDesign {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_cluster_design_effect",
      Some(s"""
        WITH per_user AS (
          SELECT user_id,
                 COUNT(*) AS n_i,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s_i
          FROM events GROUP BY user_id),
        cl AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n_i) AS BIGINT) AS n,
                 CAST(SUM(n_i * n_i) AS BIGINT) AS sum_ni2,
                 CAST(SUM(CAST(${det.sqlSnap6("s_i * s_i / n_i")}
                   AS DECIMAL(28,9))) AS DOUBLE) AS sum_t,
                 CAST(SUM(CAST(s_i AS DECIMAL(28,9))) AS DOUBLE) AS s
          FROM per_user),
        sq AS (
          SELECT CAST(SUM(CAST(${det.sqlSnap6("value * value")}
                   AS DECIMAL(28,9))) AS DOUBLE) AS sum_y2
          FROM events),
        ms AS (
          SELECT k, n,
                 (sum_t - s * s / n) / (k - 1) AS msb,
                 (sum_y2 - sum_t) / (n - k) AS msw,
                 (n - sum_ni2 * 1.0 / n) / (k - 1) AS n0
          FROM cl, sq),
        icc AS (
          SELECT k, n, msb, msw,
                 (msb - msw) / (msb + (n0 - 1) * msw) AS rho
          FROM ms)
        SELECT k AS n_clusters, n AS n_events,
               ${det.sqlSnap9("msb")} AS msb,
               ${det.sqlSnap9("msw")} AS msw,
               ${det.sqlSnap9("rho")} AS icc,
               ${det.sqlSnap9("1.0 + (n * 1.0 / k - 1.0) * rho")} AS deff,
               ${det.sqlSnap9("n / (1.0 + (n * 1.0 / k - 1.0) * rho)")}
                 AS effective_n
        FROM icc
      """.trim),
      (s, d) => {
        val ev = events(s, d)
        val perUser = ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_i"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("s_i"))
        val cl = perUser.agg(
          count(lit(1)).cast("long").as("k"),
          sum(col("n_i")).cast("long").as("n"),
          sum(col("n_i") * col("n_i")).cast("long").as("sum_ni2"),
          sum(det.snap6(col("s_i") * col("s_i") / col("n_i"))
            .cast(DecimalType(28, 9))).cast("double").as("sum_t"),
          sum(col("s_i").cast(DecimalType(28, 9))).cast("double").as("s"))
        val sq = ev.agg(
          sum(det.snap6(col("value") * col("value"))
            .cast(DecimalType(28, 9))).cast("double").as("sum_y2"))
        val ms = cl.crossJoin(broadcast(sq))
          .select(col("k"), col("n"),
            ((col("sum_t") - col("s") * col("s") / col("n")) / (col("k") - 1))
              .as("msb"),
            ((col("sum_y2") - col("sum_t")) / (col("n") - col("k"))).as("msw"),
            ((col("n") - col("sum_ni2") * 1.0 / col("n")) / (col("k") - 1))
              .as("n0"))
        val icc = ms.select(col("k"), col("n"), col("msb"), col("msw"),
          ((col("msb") - col("msw"))
            / (col("msb") + (col("n0") - 1) * col("msw"))).as("rho"))
        icc.select(col("k").as("n_clusters"), col("n").as("n_events"),
          det.snap9(col("msb")).as("msb"),
          det.snap9(col("msw")).as("msw"),
          det.snap9(col("rho")).as("icc"),
          det.snap9(lit(1.0) + (col("n") * 1.0 / col("k") - 1.0) * col("rho"))
            .as("deff"),
          det.snap9(col("n")
            / (lit(1.0) + (col("n") * 1.0 / col("k") - 1.0) * col("rho")))
            .as("effective_n"))
      }))
}
