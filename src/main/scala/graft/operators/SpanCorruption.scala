package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** T5-style span-corruption masking plan (Raffel et al., JMLR 2020):
  * for each document, deterministically place ⌈15%·n/3⌉ spans of
  * length 2–4 tokens (mean 3) whose union is the masked set — the
  * prep step of every seq2seq/UL2 pretraining pipeline, where the
  * plan (not the RNG) must be reproducible so shards can be rebuilt
  * byte-identically. Span starts/lengths derive from the portable MD5
  * hash of (doc, span index); overlapping spans merge into the
  * distinct-position union, so `n_masked` and the realized mask ratio
  * are exact properties of the plan.
  *
  * Determinism: everything is integer — token counts, hash-derived
  * starts/lengths, distinct-position unions; the realized ratio is
  * one exact-int division (bit-identical unsnapped).
  *
  * Scale: tokenize once per doc, explode n_spans (≈n/20) rows, then
  * positions (≈0.15·n rows), and ONE distinct + aggregate keyed by
  * doc — linear in corpus tokens with map-side combine; no state.
  */
object SpanCorruption {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_span_corruption", {
        val hs = PortableHash.sqlH32("doc_id || ':s:' || j")
        val hl = PortableHash.sqlH32("doc_id || ':l:' || j")
        Some(s"""
        WITH d AS (
          SELECT doc_id, source,
                 CAST(len(list_filter(string_split(${sqlClean("text")}, ' '),
                   x -> x <> '')) AS BIGINT) AS n
          FROM documents),
        plan AS (
          SELECT doc_id, source, n,
                 GREATEST(1, (n * 15) // 300) AS n_spans
          FROM d WHERE n >= 7),
        spans AS (
          SELECT doc_id, source, n, n_spans,
                 UNNEST(range(1, n_spans + 1)) AS j
          FROM plan),
        placed AS (
          SELECT doc_id, source, n, n_spans, j,
                 1 + $hs % (n - 4) AS st,
                 2 + $hl % 3 AS ln
          FROM spans),
        pos0 AS (
          SELECT doc_id, source, n, n_spans,
                 UNNEST(range(st, st + ln)) AS p
          FROM placed),
        pos AS (SELECT DISTINCT doc_id, source, n, n_spans, p FROM pos0),
        agg AS (
          SELECT doc_id, source, MAX(n) AS n, MAX(n_spans) AS n_spans,
                 COUNT(*) AS n_masked
          FROM pos GROUP BY doc_id, source)
        SELECT doc_id, source, CAST(n AS BIGINT) AS n_tokens,
               CAST(n_spans AS BIGINT) AS n_spans,
               CAST(n_masked AS BIGINT) AS n_masked,
               n_masked * 1.0 / n AS mask_ratio
        FROM agg
        ORDER BY doc_id
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val dd = documents(s, d)
          .select($"doc_id", $"source",
            size(filter(split(cleanText($"text"), " "), x => x =!= lit("")))
              .cast("long").as("n"))
        val plan = dd.filter($"n" >= 7)
          .withColumn("n_spans", greatest(lit(1L), expr("(n * 15) div 300")))
        val spans = plan
          .select($"doc_id", $"source", $"n", $"n_spans",
            explode(sequence(lit(1L), $"n_spans")).as("j"))
        val placed = spans.select($"doc_id", $"source", $"n", $"n_spans", $"j",
          (lit(1) + PortableHash.h32(concat($"doc_id", lit(":s:"), $"j"))
            % ($"n" - 4)).as("st"),
          (lit(2) + PortableHash.h32(concat($"doc_id", lit(":l:"), $"j"))
            % 3).as("ln"))
        val pos = placed
          .select($"doc_id", $"source", $"n", $"n_spans",
            explode(sequence($"st", $"st" + $"ln" - 1)).as("p"))
          .distinct()
        pos.groupBy($"doc_id", $"source")
          .agg(max($"n").as("n"), max($"n_spans").as("n_spans"),
            count(lit(1)).as("n_masked"))
          .select($"doc_id", $"source", $"n".cast("long").as("n_tokens"),
            $"n_spans".cast("long").as("n_spans"),
            $"n_masked".cast("long").as("n_masked"),
            ($"n_masked" * lit(1.0) / $"n").as("mask_ratio"))
          .orderBy($"doc_id")
      }))
}
