package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy token-budget allocation across sources — the curation
  * decision that actually ends a data run: given a 40k-token budget,
  * admit whole sources in descending quality-per-token order until
  * the budget is exhausted, then take a prefix of the straddling
  * source. Quality density reuses the pl_loo_value rule composite.
  * Output per source: its density rank, cumulative tokens, and the
  * admitted token count (full / partial / zero) — the allocation
  * table a mixture builder executes.
  *
  * Determinism: token counts and quality scores are exact integers;
  * density ordering ties break on source; the greedy prefix is a
  * cumulative-sum comparison, not an iterative scan.
  *
  * Scale: one per-source aggregate (bounded by |sources|); the
  * cumulative window runs over sources, not documents.
  */
object BudgetAllocation {

  private val budget = 40000L

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_budget_allocation", {
        val sw = graft.functions.TextFunctions.englishStopwords.toSeq.sorted
          .map(w => s"'$w'").mkString(", ")
        Some(s"""
        WITH q AS (
          SELECT source,
                 CAST(len(list_filter(string_split(${sqlClean("text")}, ' '),
                   x -> x <> '')) AS BIGINT) AS n_tok,
                 (CASE WHEN len(string_split(text, ' ')) >= 20 THEN 5 ELSE 0 END
                  + CASE WHEN (len(list_filter(string_split(text, ' '),
                        t -> list_contains([$sw], t))) * 1.0
                        / len(string_split(text, ' '))) BETWEEN 0.01 AND 0.6
                    THEN 3 ELSE 0 END
                  + CASE WHEN ((length(text) - len(string_split(text, ' ')) + 1)
                        * 1.0 / len(string_split(text, ' ')))
                        BETWEEN 3.0 AND 10.0 THEN 2 ELSE 0 END) AS q10
          FROM documents),
        per AS (
          SELECT source, SUM(n_tok) AS toks, SUM(q10) AS qsum
          FROM q GROUP BY source),
        ranked AS (
          SELECT source, toks, qsum,
                 qsum * 1.0 / toks AS density,
                 ROW_NUMBER() OVER (ORDER BY qsum * 1.0 / toks DESC, source)
                   AS rk,
                 SUM(toks) OVER (ORDER BY qsum * 1.0 / toks DESC, source
                                 ROWS UNBOUNDED PRECEDING) AS cum
          FROM per)
        SELECT source, CAST(rk AS BIGINT) AS rank,
               CAST(toks AS BIGINT) AS source_tokens,
               ${det.sqlSnap9("density")} AS quality_density,
               CAST(cum AS BIGINT) AS cum_tokens,
               CAST(CASE WHEN cum <= $budget THEN toks
                         WHEN cum - toks < $budget THEN $budget - (cum - toks)
                         ELSE 0 END AS BIGINT) AS admitted_tokens
        FROM ranked
        ORDER BY rank
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val sw = graft.functions.TextFunctions.englishStopwords.toSeq.sorted
        val base = documents(s, d).select($"source",
          size(filter(split(cleanText($"text"), " "), x => x =!= lit("")))
            .cast("long").as("n_tok"),
          size(split($"text", " ")).cast("long").as("raw_n"),
          (size(filter(split($"text", " "), t => t.isInCollection(sw)))
            * lit(1.0) / size(split($"text", " "))).as("stop_ratio"),
          ((length($"text") - size(split($"text", " ")) + 1) * lit(1.0)
            / size(split($"text", " "))).as("mtl"))
        val q = base.select($"source", $"n_tok",
          (when($"raw_n" >= 20, 5).otherwise(0)
            + when($"stop_ratio".between(0.01, 0.6), 3).otherwise(0)
            + when($"mtl".between(3.0, 10.0), 2).otherwise(0)).as("q10"))
        val per = q.groupBy($"source")
          .agg(sum($"n_tok").as("toks"), sum($"q10").as("qsum"))
        // |sources| is a bounded dimension — these windows order ~20
        // rows, not documents
        val ord = Window.orderBy(($"qsum" * lit(1.0) / $"toks").desc, $"source")
        val ranked = per
          .withColumn("density", $"qsum" * lit(1.0) / $"toks")
          .withColumn("rk", row_number().over(ord))
          .withColumn("cum", sum($"toks").over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ranked.select($"source", $"rk".cast("long").as("rank"),
            $"toks".cast("long").as("source_tokens"),
            det.snap9($"density").as("quality_density"),
            $"cum".cast("long").as("cum_tokens"),
            when($"cum" <= budget, $"toks")
              .when($"cum" - $"toks" < budget, lit(budget) - ($"cum" - $"toks"))
              .otherwise(0L).cast("long").as("admitted_tokens"))
          .orderBy($"rank")
      }))
}
