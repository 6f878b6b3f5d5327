package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Encoding-corruption audit — the unglamorous first pass of every
  * web-scale text pipeline: count documents carrying the signatures of
  * broken charset handling so the ingest layer can quarantine or
  * re-decode them.
  *
  * Four independent detectors, each a cheap scan-local predicate:
  *   - U+FFFD replacement characters (a decoder already gave up);
  *   - classic UTF-8-as-Latin-1 mojibake markers ("Ã" + continuation
  *     or the "â€"-family punctuation wrecks);
  *   - C0 control characters other than tab/newline/CR (binary
  *     contamination or terminal escapes);
  *   - runs of ≥3 '?' (lossy transcoding that substituted instead of
  *     failing).
  *
  * Regex parity: patterns use only literals, classes, and bounded
  * repetition — the subset where Java regex (Spark) and RE2 (DuckDB)
  * agree. Counts are integers; rates are single divisions, snap9'd.
  *
  * Scale: one scan, four codegen'd rlike/contains predicates, one
  * map-side-combined hash aggregate to |sources| rows. Nothing
  * shuffles but the final tiny aggregate.
  */
object Encoding {

  private val controlRe = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
  private val qrunRe = "\\?{3,}"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_encoding_artifacts",
      Some(s"""
        WITH flags AS (
          SELECT source,
                 CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END AS f_fffd,
                 CASE WHEN contains(text, 'Ã') OR contains(text, 'â€')
                      THEN 1 ELSE 0 END AS f_moji,
                 CASE WHEN regexp_matches(text, '$controlRe') THEN 1 ELSE 0 END AS f_ctrl,
                 CASE WHEN regexp_matches(text, '$qrunRe') THEN 1 ELSE 0 END AS f_qrun
          FROM documents)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(f_fffd) AS BIGINT) AS n_replacement_char,
               CAST(SUM(f_moji) AS BIGINT) AS n_mojibake,
               CAST(SUM(f_ctrl) AS BIGINT) AS n_control_chars,
               CAST(SUM(f_qrun) AS BIGINT) AS n_question_runs,
               CAST(SUM(CASE WHEN f_fffd + f_moji + f_ctrl + f_qrun > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               ${det.sqlSnap9("SUM(CASE WHEN f_fffd + f_moji + f_ctrl + f_qrun > 0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)")} AS flagged_rate
        FROM flags
        GROUP BY source
        ORDER BY source
      """.trim),
      (s, d) => {
        val f = (c: org.apache.spark.sql.Column) =>
          when(c, lit(1)).otherwise(lit(0))
        val flags = documents(s, d).select(col("source"),
          f(col("text").contains("�")).as("f_fffd"),
          f(col("text").contains("Ã") || col("text").contains("â€")).as("f_moji"),
          f(col("text").rlike(controlRe)).as("f_ctrl"),
          f(col("text").rlike(qrunRe)).as("f_qrun"))
        flags.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("f_fffd")).as("n_replacement_char"),
            sum(col("f_moji")).as("n_mojibake"),
            sum(col("f_ctrl")).as("n_control_chars"),
            sum(col("f_qrun")).as("n_question_runs"),
            sum(when(col("f_fffd") + col("f_moji") + col("f_ctrl")
              + col("f_qrun") > 0, lit(1)).otherwise(lit(0))).as("n_flagged"),
            det.snap9(
              sum(when(col("f_fffd") + col("f_moji") + col("f_ctrl")
                + col("f_qrun") > 0, lit(1)).otherwise(lit(0))) * lit(1.0)
                / count(lit(1))).as("flagged_rate"))
          .orderBy(col("source"))
      }))
}
