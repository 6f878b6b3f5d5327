package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Leave-one-source-out data valuation — the cheapest member of the
  * data-Shapley family (Ghorbani & Zou, ICML'19 reduced to the LOO
  * marginal): each source's value is how much the corpus-level
  * quality metric (mean composite quality score) DROPS when that
  * source is removed. Because the metric is a ratio of sums, every
  * LOO contribution derives from per-source sums alone — no re-scan
  * per source, which is the whole trick that makes valuation feasible
  * on a 100 TB corpus. Negative-value sources are the actionable
  * output: removing them would RAISE corpus quality.
  *
  * Quality reuses the ta_quality_score rule composite (length /
  * stopword / token-length bands — integer-scored per doc ×10 to stay
  * integer).
  *
  * Determinism: per-doc scores are exact integers (band predicates on
  * exact ratios... the bands compare identical fixed-order doubles);
  * all sums integer; contributions are exact-int ratios, snapped.
  *
  * Scale: ONE hash aggregate to per-source (sum, count); the LOO
  * algebra is a |sources|-row fold.
  */
object LooValue {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_loo_value", {
        val sw = graft.functions.TextFunctions.englishStopwords.toSeq.sorted
          .map(w => s"'$w'").mkString(", ")
        Some(s"""
        WITH q AS (
          SELECT source,
                 (CASE WHEN n_tokens >= 20 THEN 5 ELSE 0 END
                  + CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6 THEN 3 ELSE 0 END
                  + CASE WHEN mean_token_len BETWEEN 3.0 AND 10.0 THEN 2 ELSE 0 END) AS q10
          FROM (
            SELECT source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   (len(list_filter(string_split(text, ' '),
                      t -> list_contains([$sw], t))) * 1.0
                      / len(string_split(text, ' '))) AS stop_ratio,
                   ((length(text) - len(string_split(text, ' ')) + 1) * 1.0
                      / len(string_split(text, ' '))) AS mean_token_len
            FROM documents)),
        per AS (
          SELECT source, COUNT(*) AS n, SUM(q10) AS s
          FROM q GROUP BY source),
        tot AS (SELECT SUM(n) AS nt, SUM(s) AS st FROM per)
        SELECT per.source,
               CAST(per.n AS BIGINT) AS n_docs,
               ${det.sqlSnap9("per.s * 1.0 / per.n / 10.0")} AS source_quality,
               ${det.sqlSnap9("tot.st * 1.0 / tot.nt / 10.0")} AS corpus_quality,
               ${det.sqlSnap9(
          "(tot.st * 1.0 / tot.nt" +
            " - (tot.st - per.s) * 1.0 / (tot.nt - per.n)) / 10.0")} AS loo_value,
               ${det.sqlSnap9(
          "(tot.st * 1.0 / tot.nt" +
            " - (tot.st - per.s) * 1.0 / (tot.nt - per.n)) / 10.0")} < 0
                 AS harmful
        FROM per CROSS JOIN tot
        ORDER BY per.source
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val sw = graft.functions.TextFunctions.englishStopwords.toSeq.sorted
        val base = documents(s, d).select($"source",
          size(split($"text", " ")).cast("long").as("n_tokens"),
          (size(filter(split($"text", " "), t => t.isInCollection(sw)))
            * lit(1.0) / size(split($"text", " "))).as("stop_ratio"),
          ((length($"text") - size(split($"text", " ")) + 1) * lit(1.0)
            / size(split($"text", " "))).as("mean_token_len"))
        val q = base.select($"source",
          (when($"n_tokens" >= 20, 5).otherwise(0)
            + when($"stop_ratio".between(0.01, 0.6), 3).otherwise(0)
            + when($"mean_token_len".between(3.0, 10.0), 2).otherwise(0))
            .as("q10"))
        val per = q.groupBy($"source")
          .agg(count(lit(1)).as("n"), sum($"q10").as("s"))
        val tot = per.agg(sum($"n").as("nt"), sum($"s").as("st"))
        val loo = det.snap9(($"st" * lit(1.0) / $"nt"
          - ($"st" - $"s") * lit(1.0) / ($"nt" - $"n")) / 10.0)
        per.crossJoin(broadcast(tot))
          .select($"source", $"n".cast("long").as("n_docs"),
            det.snap9($"s" * lit(1.0) / $"n" / 10.0).as("source_quality"),
            det.snap9($"st" * lit(1.0) / $"nt" / 10.0).as("corpus_quality"),
            loo.as("loo_value"), (loo < 0).as("harmful"))
          .orderBy($"source")
      }))
}
