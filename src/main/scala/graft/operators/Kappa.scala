package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Cohen's kappa (Cohen, 1960) between two independent document
  * quality raters, per source — the label-QA primitive of every
  * annotation pipeline: raw agreement p_o is meaningless when both
  * raters mostly say "keep", so kappa discounts the chance-agreement
  * floor p_e = Σ marginal products. Here the "raters" are two
  * deterministic rule judges a curation pipeline actually runs —
  * rater A: document length in the trainable band (300–5000 chars);
  * rater B: at least 40 whitespace-delimited words — so the statistic
  * measures how much of their agreement is real signal overlap.
  *
  * Determinism: both verdicts are integer 0/1 on exact expressions
  * (the word count is the literal length-minus-length-of-despaced
  * formula in both engines); the kappa fold is fixed-order double
  * from integer cell counts, snapped. p_e = 1 (degenerate constant
  * raters) nulls the ratio identically via NULLIF.
  *
  * Scale: ONE hash aggregate to per-source contingency cells — the
  * 2×2 table is four mergeable counters per key.
  */
object Kappa {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_rater_kappa",
      Some(s"""
        WITH r AS (
          SELECT source,
                 CASE WHEN n_chars BETWEEN 300 AND 5000 THEN 1 ELSE 0 END AS a,
                 CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
                        >= 40 THEN 1 ELSE 0 END AS b
          FROM documents),
        g AS (
          SELECT source, COUNT(*) AS n, SUM(a) AS sa, SUM(b) AS sb,
                 SUM(a * b) AS s11, SUM((1 - a) * (1 - b)) AS s00
          FROM r GROUP BY source),
        k AS (
          SELECT source, n, sa, sb, s11, s00,
                 (s11 + s00) * 1.0 / n AS po,
                 (sa * 1.0 / n) * (sb * 1.0 / n)
                   + (1 - sa * 1.0 / n) * (1 - sb * 1.0 / n) AS pe
          FROM g)
        SELECT source, CAST(n AS BIGINT) AS n,
               CAST(sa AS BIGINT) AS a_pos, CAST(sb AS BIGINT) AS b_pos,
               CAST(s11 AS BIGINT) AS both_pos,
               ${det.sqlSnap9("po")} AS po, ${det.sqlSnap9("pe")} AS pe,
               ${det.sqlSnap9("(po - pe) / NULLIF(1 - pe, 0)")} AS kappa
        FROM k
        ORDER BY source
      """.trim),
      (s, d) => {
        import s.implicits._
        val r = documents(s, d).select($"source",
          when($"n_chars".between(300, 5000), 1).otherwise(0).as("a"),
          when(expr("length(text) - length(replace(text, ' ', '')) + 1") >= 40,
            1).otherwise(0).as("b"))
        val g = r.groupBy($"source")
          .agg(count(lit(1)).as("n"), sum($"a").as("sa"), sum($"b").as("sb"),
            sum($"a" * $"b").as("s11"),
            sum((lit(1) - $"a") * (lit(1) - $"b")).as("s00"))
        val k = g.select($"source", $"n", $"sa", $"sb", $"s11", $"s00",
          (($"s11" + $"s00") * lit(1.0) / $"n").as("po"),
          (($"sa" * lit(1.0) / $"n") * ($"sb" * lit(1.0) / $"n")
            + (lit(1) - $"sa" * lit(1.0) / $"n")
            * (lit(1) - $"sb" * lit(1.0) / $"n")).as("pe"))
        k.select($"source", $"n".cast("long").as("n"),
            $"sa".cast("long").as("a_pos"), $"sb".cast("long").as("b_pos"),
            $"s11".cast("long").as("both_pos"),
            det.snap9($"po").as("po"), det.snap9($"pe").as("pe"),
            det.snap9(($"po" - $"pe") / nullif(lit(1) - $"pe", lit(0)))
              .as("kappa"))
          .orderBy($"source")
      }))
}
