package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Unicode NFC normalization audit — the ingest hygiene pass a
  * multilingual 100 TB text corpus runs before ANY dedup or hashing:
  * the same visible string in composed vs decomposed form hashes
  * differently, splits shingles differently, and double-counts
  * vocabulary. The audit classifies documents by planted normalization
  * case and reports how many change under NFC and by how many
  * codepoints.
  *
  * The oracle here is a genuinely INDEPENDENT implementation, not a
  * formula mirror: the Spark side normalizes with the JDK's
  * `java.text.Normalizer` (Unicode data shipped with the JVM), the
  * DuckDB side with its own `nfc_normalize` (utf8proc) — two unrelated
  * codebases that must agree on every count because NFC is a
  * deterministic, versioned standard. Codepoint lengths are counted
  * with `codePointCount` to match DuckDB's codepoint `length`
  * semantics (NOT Spark's UTF-16 `length`).
  *
  * Planted cases by doc_id % 6 (suffixes appended to a 16-char text
  * prefix): pure ASCII; combining acute (e + U+0301, composes);
  * decomposed ring+umlaut (A+U+030A, o+U+0308, composes twice);
  * precomposed e-acute (NFC no-op); Hangul jamo pair (U+1100 U+1161 ->
  * U+AC00, the algorithmic-composition case); fi ligature U+FB01
  * (NFC-invariant — it would change only under NFKC, pinning that the
  * implementations run NFC and not NFKC).
  *
  * Scale: normalize is a row-local map; the census is one tiny
  * groupBy. A UDF is acceptable here: normalization is a
  * character-table lookup no Catalyst expression provides, and it
  * never leaves the map side. */
object TaNfc {

  /** Planted suffixes, index = doc_id % 6. Source stays ASCII-clean:
    * the non-ASCII codepoints are written as Scala escapes. */
  private[graft] val cases: Seq[(String, String)] = Seq(
    ("ascii_only", ""),
    ("combining_acute", "cafe\u0301"),
    ("decomposed_ring_umlaut", "A\u030angstro\u0308m"),
    ("precomposed", "caf\u00e9"),
    ("hangul_jamo", "\u1100\u1161"),
    ("ligature_fi_nfc_invariant", "\ufb01nal"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_nfc_audit", {
        val sqlCase = cases.zipWithIndex.map { case ((label, _), i) =>
          s"WHEN $i THEN '$label'"
        }.mkString(" ")
        val sqlSuffix = cases.zipWithIndex.map { case ((_, suf), i) =>
          s"WHEN $i THEN '$suf'" // real UTF-8 chars in the shipped SQL
        }.mkString(" ")
        Some(s"""
          WITH t AS (
            SELECT doc_id,
                   CASE doc_id % 6 $sqlCase END AS case_label,
                   substr(text, 1, 16) || CASE doc_id % 6 $sqlSuffix END AS txt
            FROM documents),
          n AS (
            SELECT case_label, txt, nfc_normalize(txt) AS nfc FROM t)
          SELECT case_label,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN nfc <> txt THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_changed,
                 CAST(SUM(length(txt)) AS BIGINT) AS cp_before,
                 CAST(SUM(length(nfc)) AS BIGINT) AS cp_after
          FROM n GROUP BY case_label
          ORDER BY case_label
        """.trim)
      },
      (s, d) => {
        val nfc = udf((x: String) =>
          java.text.Normalizer.normalize(x, java.text.Normalizer.Form.NFC))
        val cpLen = udf((x: String) => x.codePointCount(0, x.length).toLong)
        val labelCol = cases.zipWithIndex.foldLeft(lit(null).cast("string")) {
          case (acc, ((label, _), i)) =>
            when(col("doc_id") % 6 === i, lit(label)).otherwise(acc)
        }
        val suffixCol = cases.zipWithIndex.foldLeft(lit(null).cast("string")) {
          case (acc, ((_, suf), i)) =>
            when(col("doc_id") % 6 === i, lit(suf)).otherwise(acc)
        }
        documents(s, d)
          .select(labelCol.as("case_label"),
            concat(substring(col("text"), 1, 16), suffixCol).as("txt"))
          .withColumn("nfc", nfc(col("txt")))
          .groupBy(col("case_label"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("nfc") =!= col("txt"), 1L).otherwise(0L)).as("n_changed"),
            sum(cpLen(col("txt"))).as("cp_before"),
            sum(cpLen(col("nfc"))).as("cp_after"))
          .orderBy(col("case_label"))
      }))
}
