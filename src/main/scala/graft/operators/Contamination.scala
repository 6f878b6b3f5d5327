package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Benchmark-contamination audit (the GPT-3 appendix-C / PaLM-style
  * decontamination check): for every document in a held-out evaluation
  * slice, the fraction of its distinct token 4-grams that appear
  * ANYWHERE in the training corpus. A high overlap ratio means the
  * eval document leaks through the train split and its scores are
  * memorization, not generalization — the audit every serious LLM
  * training run performs before quoting benchmark numbers, and one
  * that only gets more important at 100 TB where no human can eyeball
  * the split.
  *
  * Slice: doc_id % 41 == 7 is the "benchmark" (held-out) side; the
  * rest is the training corpus. Flagged = strictly more than half of
  * the eval doc's 4-grams occur in training (2·hits > grams — an
  * integer predicate, no float threshold to straddle).
  *
  * Determinism: all counts are exact integers; the single double
  * column is one division of two BIGINTs (identical IEEE result on
  * both engines, no snapping needed).
  *
  * Scale: the train-side 4-gram vocabulary is collapsed to DISTINCT
  * grams BEFORE the probe (hot boilerplate grams would otherwise fan
  * the join out), and the probe itself is a hash-partitioned LEFT SEMI
  * join on the gram string — both sides shuffle once on the join key;
  * nothing is ever collected. At 100 TB the distinct-gram table is the
  * big side and the eval slice is small: the same plan broadcast-flips
  * automatically under AQE if the eval side fits.
  */
object Contamination {

  private val evalMod = 41L
  private val evalRes = 7L

  /** Distinct token 4-grams per doc (bigrams/trigrams are saturated
    * on this corpus — every gram occurs in training and the flag never
    * varies; 4-grams give the audit an actual distribution and surface
    * the planted near-duplicate families leaking across the split), single-pass (the expression
    * formulation re-splits the string per element — the shingleUdf
    * lesson from Dedup.scala). */
  private val gram4Udf = udf { text: String =>
    if (text == null) null
    else {
      val tk = text.split(" ", -1)
      if (tk.length < 4) null
      else {
        val seen = new java.util.LinkedHashSet[String]
        var i = 0
        while (i + 3 < tk.length) {
          seen.add(tk(i) + "_" + tk(i + 1) + "_" + tk(i + 2) + "_" + tk(i + 3))
          i += 1
        }
        seen.toArray(Array.empty[String])
      }
    }
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_contamination_ngrams",
      Some(s"""
        WITH g AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 2),
                   i -> string_split(text, ' ')[i] || '_' ||
                        string_split(text, ' ')[i+1] || '_' ||
                        string_split(text, ' ')[i+2] || '_' ||
                        string_split(text, ' ')[i+3]))) AS g
          FROM documents
          WHERE len(string_split(text, ' ')) >= 4),
        ev AS (SELECT doc_id, g FROM g WHERE doc_id % $evalMod = $evalRes),
        tr AS (SELECT DISTINCT g FROM g WHERE doc_id % $evalMod <> $evalRes),
        tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM ev GROUP BY doc_id),
        hit AS (
          SELECT ev.doc_id, COUNT(*) AS n_hit
          FROM ev SEMI JOIN tr ON ev.g = tr.g
          GROUP BY ev.doc_id)
        SELECT t.doc_id,
               CAST(t.n_grams AS BIGINT) AS n_grams,
               CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
               COALESCE(h.n_hit, 0) * 1.0 / t.n_grams AS overlap_ratio,
               2 * COALESCE(h.n_hit, 0) > t.n_grams AS contaminated
        FROM tot t LEFT JOIN hit h ON h.doc_id = t.doc_id
        ORDER BY t.doc_id
      """.trim),
      (s, d) => {
        val grams = documents(s, d)
          .select(col("doc_id"), explode(gram4Udf(col("text"))).as("g"))
        val ev = grams.filter(col("doc_id") % evalMod === evalRes)
        val tr = grams.filter(col("doc_id") % evalMod =!= evalRes)
          .select(col("g")).distinct()
        val tot = ev.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"))
        val hit = ev.join(tr, Seq("g"), "left_semi")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
        tot.join(hit, Seq("doc_id"), "left")
          .select(col("doc_id"),
            col("n_grams").cast("long").as("n_grams"),
            coalesce(col("n_hit"), lit(0L)).cast("long").as("n_hit"),
            (coalesce(col("n_hit"), lit(0L)) * lit(1.0) / col("n_grams"))
              .as("overlap_ratio"),
            (lit(2) * coalesce(col("n_hit"), lit(0L)) > col("n_grams"))
              .as("contaminated"))
          .orderBy(col("doc_id"))
      }))
}
