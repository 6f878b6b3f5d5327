package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Corpus-hygiene gates in the Gopher/C4 style — the two per-source
  * datasheet readouts a pretraining pipeline runs before mixing:
  *
  * ta_dup_ngram_rate: the memorization metric — what fraction of word
  * 5-gram OCCURRENCES within a source are repeats (total − distinct) /
  * total, plus the share of occurrences whose 5-gram appears more than
  * once. High values mean the source is internally templated and will
  * be over-weighted by a token-count mixture. Dataflow: one positional
  * array transform (no UDF — `transform`/`slice` stay inside
  * whole-stage codegen), one (source, gram) hash aggregate, one
  * per-source rollup; every statistic is a ratio of exact integers so
  * the doubles hash-match bit-for-bit. At 100 TB the (source, gram)
  * aggregate is the only wide state and it is map-side combined.
  *
  * ta_gopher_rules: named rule gates (min word count, mean-word-length
  * band, max single-word repetition share, stopword-ratio ceiling —
  * the Gopher rules re-thresholded for this corpus' measured ranges)
  * with per-source failure counts per rule and the all-rules pass
  * rate. Every per-document statistic is derived from exact integer
  * token counts (char totals via Σ count·length), so the threshold
  * comparisons are deterministic double comparisons of identical
  * values in both engines. One token explode + two hash aggregates.
  */
object QualityRules {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ta_dup_ngram_rate",
      Some("""
        WITH w AS (
          SELECT source, string_split(text, ' ') AS toks FROM documents
          WHERE len(string_split(text, ' ')) >= 5),
        g AS (
          SELECT source,
                 unnest(list_transform(range(1, len(toks) - 3),
                        i -> array_to_string(toks[i:i+4], ' '))) AS gram
          FROM w),
        c AS (SELECT source, gram, COUNT(*) AS n FROM g GROUP BY 1, 2)
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS n_ngrams,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               (SUM(n) - COUNT(*)) * 1.0 / SUM(n) AS dup_rate,
               SUM(CASE WHEN n > 1 THEN n ELSE 0 END) * 1.0 / SUM(n) AS rep_rate
        FROM c GROUP BY source ORDER BY source
      """.trim),
      (s, d) => {
        import s.implicits._
        val g = documents(s, d)
          .withColumn("toks", split($"text", " "))
          .filter(size($"toks") >= 5)
          .select($"source", explode(expr(
            "transform(sequence(1, size(toks) - 4), " +
              "i -> concat_ws(' ', slice(toks, i, 5)))")).as("gram"))
        g.groupBy($"source", $"gram").agg(count(lit(1)).as("n"))
          .groupBy($"source")
          .agg(sum($"n").as("tot"), count(lit(1)).as("dst"),
            sum(when($"n" > 1, $"n").otherwise(0)).as("rep"))
          .select($"source",
            $"tot".cast("long").as("n_ngrams"),
            $"dst".cast("long").as("n_distinct"),
            (($"tot" - $"dst") * lit(1.0) / $"tot").as("dup_rate"),
            ($"rep" * lit(1.0) / $"tot").as("rep_rate"))
          .orderBy($"source")
      }),

    QueryDef(
      "ta_gopher_rules",
      Some("""
        WITH f AS (
          SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        c AS (SELECT source, doc_id, tok, COUNT(*) AS n
              FROM f GROUP BY 1, 2, 3),
        m AS (
          SELECT source, doc_id,
                 SUM(n) AS wc,
                 MAX(n) AS mx,
                 SUM(n * length(tok)) AS chars,
                 SUM(CASE WHEN tok IN ('a', 'the') THEN n ELSE 0 END) AS stop
          FROM c GROUP BY 1, 2),
        r AS (
          SELECT source,
                 wc >= 30 AS p_wc,
                 chars * 1.0 / wc >= 3.8 AND chars * 1.0 / wc <= 5.0 AS p_mwl,
                 mx * 1.0 / wc <= 0.12 AS p_rep,
                 stop * 1.0 / wc <= 0.10 AS p_stop
          FROM m)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN NOT p_wc THEN 1 ELSE 0 END) AS BIGINT) AS fail_short,
               CAST(SUM(CASE WHEN NOT p_mwl THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordlen,
               CAST(SUM(CASE WHEN NOT p_rep THEN 1 ELSE 0 END) AS BIGINT) AS fail_repeat,
               CAST(SUM(CASE WHEN NOT p_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopword,
               CAST(SUM(CASE WHEN p_wc AND p_mwl AND p_rep AND p_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               SUM(CASE WHEN p_wc AND p_mwl AND p_rep AND p_stop THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS pass_rate
        FROM r GROUP BY source ORDER BY source
      """.trim),
      (s, d) => {
        import s.implicits._
        val c = documents(s, d)
          .select($"source", $"doc_id", explode(split($"text", " ")).as("tok"))
          .groupBy($"source", $"doc_id", $"tok").agg(count(lit(1)).as("n"))
        val m = c.groupBy($"source", $"doc_id")
          .agg(sum($"n").as("wc"), max($"n").as("mx"),
            sum($"n" * length($"tok")).as("chars"),
            sum(when($"tok".isin("a", "the"), $"n").otherwise(0)).as("stop"))
        val mwl = $"chars" * lit(1.0) / $"wc"
        val r = m.select($"source",
          ($"wc" >= 30).as("p_wc"),
          (mwl >= 3.8 && mwl <= 5.0).as("p_mwl"),
          ($"mx" * lit(1.0) / $"wc" <= 0.12).as("p_rep"),
          ($"stop" * lit(1.0) / $"wc" <= 0.10).as("p_stop"))
        val pass = $"p_wc" && $"p_mwl" && $"p_rep" && $"p_stop"
        r.groupBy($"source")
          .agg(count(lit(1)).as("n_docs_i"),
            sum(when(!$"p_wc", 1).otherwise(0)).as("fs"),
            sum(when(!$"p_mwl", 1).otherwise(0)).as("fm"),
            sum(when(!$"p_rep", 1).otherwise(0)).as("fr"),
            sum(when(!$"p_stop", 1).otherwise(0)).as("fp"),
            sum(when(pass, 1).otherwise(0)).as("np"))
          .select($"source",
            $"n_docs_i".cast("long").as("n_docs"),
            $"fs".cast("long").as("fail_short"),
            $"fm".cast("long").as("fail_wordlen"),
            $"fr".cast("long").as("fail_repeat"),
            $"fp".cast("long").as("fail_stopword"),
            $"np".cast("long").as("n_pass"),
            ($"np" * lit(1.0) / $"n_docs_i").as("pass_rate"))
          .orderBy($"source")
      }))
}
