package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Jensen–Shannon vocabulary drift between the first and second half
  * of the corpus (split by doc_id, the ingestion order): JS(P‖Q) =
  * ½KL(P‖M) + ½KL(Q‖M), M the mixture — symmetric, bounded by ln 2,
  * and defined even where one side has zero mass, which is exactly
  * why it (not KL) is the crawl-drift alarm: new-vocabulary mass
  * appears as finite JS contribution instead of infinity. Terms are
  * restricted to the shared frequent set (count ≥ 20 overall) so the
  * statistic tracks distribution shift, not hapax noise; the
  * complement of ta_hellinger_drift's source-to-source comparison on
  * the TIME axis.
  *
  * Determinism: counts are exact; each JS term is one snapped double
  * folded in DECIMAL; zero-mass branches take the same exact-integer
  * predicate in both engines.
  *
  * Scale: tokenize-explode → one (term, period) aggregate → a
  * frequent-term filter (absolute predicate, no rank) → a bounded
  * term-level fold.
  */
object JsTimeDrift {

  private val minCount = 20

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_js_time_drift",
      Some(s"""
        WITH mid AS (
          SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
        toks AS (
          SELECT CASE WHEN doc_id < m THEN 0 ELSE 1 END AS period, w
          FROM (SELECT doc_id,
                       UNNEST(string_split(${sqlClean("text")}, ' ')) AS w
                FROM documents) t CROSS JOIN mid
          WHERE w <> ''),
        cnt AS (
          SELECT w, period, COUNT(*) AS c FROM toks GROUP BY w, period),
        kept AS (
          SELECT w,
                 SUM(CASE WHEN period = 0 THEN c ELSE 0 END) AS c1,
                 SUM(CASE WHEN period = 1 THEN c ELSE 0 END) AS c2
          FROM cnt GROUP BY w
          HAVING SUM(c) >= $minCount),
        tot AS (
          SELECT SUM(c1) AS t1, SUM(c2) AS t2, COUNT(*) AS n_terms FROM kept),
        terms AS (
          SELECT k.w, tot.n_terms,
                 CAST(${det.sqlSnap9(
          "CASE WHEN k.c1 > 0 THEN (k.c1 * 1.0 / tot.t1) / 2" +
            " * ln((k.c1 * 1.0 / tot.t1)" +
            "   / ((k.c1 * 1.0 / tot.t1 + k.c2 * 1.0 / tot.t2) / 2))" +
            " ELSE 0.0 END" +
            " + CASE WHEN k.c2 > 0 THEN (k.c2 * 1.0 / tot.t2) / 2" +
            " * ln((k.c2 * 1.0 / tot.t2)" +
            "   / ((k.c1 * 1.0 / tot.t1 + k.c2 * 1.0 / tot.t2) / 2))" +
            " ELSE 0.0 END")} AS DECIMAL(28,12)) AS term
          FROM kept k CROSS JOIN tot)
        SELECT CAST(MAX(n_terms) AS BIGINT) AS n_terms,
               CAST(SUM(term) AS DOUBLE) AS js_divergence,
               ${det.sqlSnap9(
          "CAST(SUM(term) AS DOUBLE) / ln(2.0)")} AS js_normalized
        FROM terms
      """.trim),
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d)
        val mid = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2").as("m"))
        val toks = docs.crossJoin(broadcast(mid))
          .select(when($"doc_id" < $"m", 0).otherwise(1).as("period"),
            explode(split(cleanText($"text"), " ")).as("w"))
          .filter($"w" =!= "")
        val cnt = toks.groupBy($"w", $"period").agg(count(lit(1)).as("c"))
        val kept = cnt.groupBy($"w")
          .agg(sum(when($"period" === 0, $"c").otherwise(0L)).as("c1"),
            sum(when($"period" === 1, $"c").otherwise(0L)).as("c2"))
          .filter($"c1" + $"c2" >= minCount)
        val tot = kept.agg(sum($"c1").as("t1"), sum($"c2").as("t2"),
          count(lit(1)).as("n_terms"))
        val p1 = $"c1" * lit(1.0) / $"t1"
        val p2 = $"c2" * lit(1.0) / $"t2"
        val m = (p1 + p2) / 2
        val terms = kept.crossJoin(broadcast(tot))
          .select($"n_terms",
            det.snap9(
              when($"c1" > 0, p1 / 2 * log(p1 / m)).otherwise(lit(0.0))
                + when($"c2" > 0, p2 / 2 * log(p2 / m)).otherwise(lit(0.0)))
              .cast(DecimalType(28, 12)).as("term"))
        terms.agg(max($"n_terms").cast("long").as("n_terms"),
          sum($"term").cast("double").as("js_divergence"),
          det.snap9(sum($"term").cast("double") / log(lit(2.0)))
            .as("js_normalized"))
      }))
}
