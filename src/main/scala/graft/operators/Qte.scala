package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Quantile treatment effects (Doksum, Ann. Stat. 1974): the A/B
  * contrast at the 25th/50th/75th/90th percentiles of per-user
  * revenue, not just the mean — distributional effects (the
  * treatment lifting whales while hurting the median) are invisible
  * to ev_ab_ttest by construction. Quantiles are EXACT discrete order
  * statistics: the value at rank ⌈q·n⌉ of each arm, computed with the
  * same rank-pick formula in both engines rather than either's
  * builtin (whose interpolation conventions differ).
  *
  * Determinism: revenues are cent-scaled integers; ranks and picks
  * exact; QTE is an integer difference emitted in dollars.
  *
  * Scale: one per-user aggregate, ONE rank window keyed by arm (each
  * arm's users, never a global order), a 4-row literal quantile join.
  */
object Qte {

  private val qs = Seq("0.25", "0.5", "0.75", "0.9")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_qte", {
        val qRows = qs.map(q => s"($q)").mkString(", ")
        Some(s"""
        WITH u AS (
          SELECT user_id, user_id % 2 AS arm,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev
          FROM events GROUP BY user_id),
        ranked AS (
          SELECT arm, rev,
                 ROW_NUMBER() OVER (PARTITION BY arm
                                    ORDER BY rev, user_id) AS rk
          FROM u),
        arms AS (SELECT arm, COUNT(*) AS n FROM u GROUP BY arm),
        ql(q) AS (VALUES $qRows),
        picks AS (
          SELECT r.arm, ql.q, r.rev
          FROM ranked r
          JOIN arms a ON a.arm = r.arm
          JOIN ql ON r.rk = CAST(ceil(ql.q * a.n) AS BIGINT)),
        wide AS (
          SELECT q,
                 MAX(CASE WHEN arm = 0 THEN rev END) AS q_control,
                 MAX(CASE WHEN arm = 1 THEN rev END) AS q_treat
          FROM picks GROUP BY q)
        SELECT CAST(q AS DOUBLE) AS quantile,
               ${det.sqlSnap9("q_control / 100.0")} AS control,
               ${det.sqlSnap9("q_treat / 100.0")} AS treatment,
               ${det.sqlSnap9("(q_treat - q_control) / 100.0")} AS qte
        FROM wide
        ORDER BY quantile
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val u = events(s, d)
          .groupBy($"user_id", ($"user_id" % 2).as("arm"))
          .agg((sum($"value".cast(DecimalType(18, 2))) * 100)
            .cast("long").as("rev"))
        val w = Window.partitionBy($"arm").orderBy($"rev", $"user_id")
        val ranked = u.select($"arm", $"rev",
          row_number().over(w).cast("long").as("rk"))
        val arms = u.groupBy($"arm".as("a_arm")).agg(count(lit(1)).as("n"))
        val ql = qs.map(_.toDouble).toDF("q")
        val picks = ranked
          .join(broadcast(arms), $"arm" === $"a_arm")
          .join(broadcast(ql), $"rk" === ceil($"q" * $"n").cast("long"))
          .select($"arm", $"q", $"rev")
        val wide = picks.groupBy($"q")
          .agg(max(when($"arm" === 0, $"rev")).as("q_control"),
            max(when($"arm" === 1, $"rev")).as("q_treat"))
        wide.select($"q".cast("double").as("quantile"),
            det.snap9($"q_control" / 100.0).as("control"),
            det.snap9($"q_treat" / 100.0).as("treatment"),
            det.snap9(($"q_treat" - $"q_control") / 100.0).as("qte"))
          .orderBy($"quantile")
      }))
}
