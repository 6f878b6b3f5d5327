package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus statistics over the documents table: per-document lexical
  * diversity (token entropy, type-token ratio) and the corpus-level
  * Zipf rank-frequency fit — the two standard "is this corpus shaped
  * like natural language" diagnostics a pretraining datasheet reports
  * next to the quality and dedup columns.
  *
  * Determinism discipline: every log2() value is SNAPPED to the 1e-9
  * grid (`floor(x·1e9 + 0.5)/1e9`, identical IEEE ops in both engines)
  * before any DECIMAL cast or sum — libm log2 is not bit-portable
  * across engines (the ta_keywords_tfidf lesson), but the two
  * implementations agree to ~1 ulp, far inside the 5e-10 snap margin,
  * and a grid point casts to DECIMAL(28,12) exactly. Final derived
  * scores (entropy, slope) are snapped to the 1e-6 grid for the same
  * reason before they leave the query.
  */
object CorpusStats {

  /** Snap to the 1e-9 grid — exact under DECIMAL(28,12). */
  private def snap9(c: Column): Column = floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
  private def snap9Sql(e: String): String = s"floor(($e) * 1000000000 + 0.5) / 1000000000"

  /** Snap to the 1e-6 grid — the output-column grid. */
  private def snap6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  private def snap6Sql(e: String): String = s"floor(($e) * 1000000 + 0.5) / 1000000"

  val defs: Seq[QueryDef] = Seq(

    // Per-document unigram entropy + type-token ratio. H = log2(n) −
    // (Σ c·log2(c))/n over per-doc token counts c — one explode, one
    // (doc, token) hash count, one doc rollup; the Σ routes through
    // DECIMAL over snapped per-term values (exact, order-independent),
    // and c = 1 terms contribute an exact 0. Low H at high n flags the
    // repetitive boilerplate that perplexity filters would drop.
    QueryDef(
      "ta_token_entropy",
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        cnt AS (
          SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
        terms AS (
          SELECT doc_id, c,
                 CAST(${snap9Sql("c * log2(c)")} AS DECIMAL(28,12)) AS term
          FROM cnt),
        agg AS (
          SELECT doc_id,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(term) AS DOUBLE) AS s
          FROM terms GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_types,
               n_types * 1.0 / n_tokens AS ttr,
               ${snap6Sql("log2(n_tokens) - s / n_tokens")} AS entropy
        FROM agg
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val cnt = documents(s, d)
          .select($"doc_id", explode(split($"text", " ")).as("tok"))
          .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
        cnt
          .select($"doc_id", $"c",
            snap9($"c" * log2($"c")).cast(DecimalType(28, 12)).as("term"))
          .groupBy($"doc_id")
          .agg(sum($"c").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum($"term").cast("double").as("s"))
          .select($"doc_id", $"n_tokens", $"n_types",
            ($"n_types" * lit(1.0) / $"n_tokens").as("ttr"),
            snap6(log2($"n_tokens") - $"s" / $"n_tokens").as("entropy"))
          .orderBy($"doc_id")
      }),

    // Corpus Zipf fit: OLS of log2(frequency) on log2(rank) over the
    // top-100 terms — natural text slopes ≈ −1, and a flat or broken
    // slope is the classic template-spam signature. One corpus term
    // count, a 100-row rank table (top-k under a (freq, term) total
    // order — TakeOrderedAndProject-sized, never a global sort), and
    // the five OLS moments as DECIMAL sums of snapped products; the
    // closed-form slope/intercept then run the identical fixed-order
    // IEEE arithmetic in both engines.
    QueryDef(
      "ta_zipf_slope",
      Some(s"""
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        freq AS (SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok),
        top AS (
          SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
          FROM freq ORDER BY f DESC, tok LIMIT 100),
        xy AS (
          SELECT CAST(${snap9Sql("log2(r)")} AS DECIMAL(28,12)) AS x,
                 CAST(${snap9Sql("log2(f)")} AS DECIMAL(28,12)) AS y,
                 CAST(${snap9Sql("log2(r) * log2(r)")} AS DECIMAL(28,12)) AS xx,
                 CAST(${snap9Sql("log2(r) * log2(f)")} AS DECIMAL(28,12)) AS xy
          FROM top),
        m AS (
          SELECT COUNT(*) AS n,
                 CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(xx) AS DOUBLE) AS sxx, CAST(SUM(xy) AS DOUBLE) AS sxy
          FROM xy)
        SELECT CAST(n AS BIGINT) AS n_terms,
               ${snap6Sql("(n * sxy - sx * sy) / (n * sxx - sx * sx)")} AS zipf_slope,
               ${snap6Sql("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n")} AS zipf_intercept
        FROM m
      """.trim),
      (s, d) => {
        import s.implicits._
        val freq = documents(s, d)
          .select(explode(split($"text", " ")).as("tok"))
          .groupBy($"tok").agg(count(lit(1)).as("f"))
        val top = freq.orderBy($"f".desc, $"tok").limit(100)
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy($"f".desc, $"tok")))
        val xy = top.select(
          snap9(log2($"r")).cast(DecimalType(28, 12)).as("x"),
          snap9(log2($"f")).cast(DecimalType(28, 12)).as("y"),
          snap9(log2($"r") * log2($"r")).cast(DecimalType(28, 12)).as("xx"),
          snap9(log2($"r") * log2($"f")).cast(DecimalType(28, 12)).as("xy"))
        val m = xy.agg(
          count(lit(1)).as("n"),
          sum($"x").cast("double").as("sx"), sum($"y").cast("double").as("sy"),
          sum($"xx").cast("double").as("sxx"), sum($"xy").cast("double").as("sxy"))
        val slope = ($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")
        m.select($"n".cast("long").as("n_terms"),
          snap6(slope).as("zipf_slope"),
          snap6(($"sy" - slope * $"sx") / $"n").as("zipf_intercept"))
      }),

    // The datasheet header every released corpus ships: per
    // (source, lang) stratum — doc count, token volume, mean and
    // median tokens, span of doc ids. One explode-free pass (token
    // counts are row-local split sizes) and one groupBy; the median is
    // Spark's exact interpolated percentile vs DuckDB's quantile_cont
    // (same definition), snapped to the shared grid.
    QueryDef(
      "pl_dataset_card",
      Some(s"""
        WITH t AS (
          SELECT source, lang, doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
          FROM documents)
        SELECT source, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS tok_sum,
               ${snap9Sql("SUM(tok) * 1.0 / COUNT(*)")} AS tok_mean,
               ${snap9Sql("quantile_cont(tok, 0.5)")} AS tok_p50,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM t GROUP BY source, lang
        ORDER BY source, lang
      """.trim),
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"source", $"lang", $"doc_id",
            size(split($"text", " ")).cast("long").as("tok"))
          .groupBy($"source", $"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"tok").as("tok_sum"),
            snap9(sum($"tok") * 1.0 / count(lit(1))).as("tok_mean"),
            snap9(percentile($"tok", lit(0.5))).as("tok_p50"),
            min($"doc_id").as("first_doc"),
            max($"doc_id").as("last_doc"))
          .orderBy($"source", $"lang")
      }))
}
