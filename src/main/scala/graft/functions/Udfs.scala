package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-callable registrations of the engine's custom functions
  * (SURVEY.md §2.10): after `registerAll`, `spark.sql` queries can use
  * them directly. The F1 family stays pure built-ins (codegen'd); these
  * UDFs cover the semantics built-ins can't express (Python-parity
  * coercion, lenient fence parsing, marker fallback).
  */
object Udfs {

  def registerAll(spark: SparkSession): Unit = {
    // F1 — clean_string (also available as a built-in expression tree).
    spark.udf.register("clean_string",
      (s: String) => if (s == null) null else TextFunctions.cleanString(s))

    // F2 — get_keywords: tokenize with stop-word filtering.
    spark.udf.register("get_keywords",
      (s: String) => if (s == null) Seq.empty[String] else TextFunctions.getKeywords(s))

    // A1 — keyword_score: substring-containment count (Q4 semantics).
    spark.udf.register("keyword_score",
      (text: String, keywords: Seq[String]) =>
        if (text == null || keywords == null) 0
        else keywords.count(text.contains))

    // F4 — extract_fenced_json → struct(content, json) (Q6 semantics;
    // the Val variant also surfaces fenced top-level arrays, which the
    // reference returns with the span stripped).
    spark.udf.register("extract_fenced_json",
      (text: String) =>
        if (text == null) (null: String, null: String)
        else {
          val (content, data) = AgentText.splitContentAndJsonVal(text)
          (content, data.map(AgentText.renderJson).orNull)
        })

    // F6 — extract_markers with the 20-line fallback (Q11).
    spark.udf.register("extract_markers",
      (text: String, start: String, end: String) =>
        if (text == null) "" else AgentText.extractBetweenMarkers(text, start, end))

    // F7 — coerce_arg: Python-semantics coercion; NULL on invalid (Q3).
    spark.udf.register("coerce_int",
      (v: String) =>
        if (v != null && AgentText.isIntConvertible(v)) Some(v.toDouble.toLong) else None)
    spark.udf.register("coerce_bool",
      (v: String) =>
        if (v == null) None else AgentText.convertToBoolean(v))

    // F9/F10 — title derivation + filename sanitization.
    spark.udf.register("title_from_target",
      (t: String) => if (t == null) "" else AgentText.titleFromTarget(t))
    spark.udf.register("safe_filename",
      (t: String, ct: String) =>
        if (t == null) null else AgentText.safeFilename(t, if (ct == null) "" else ct))
  }

}
