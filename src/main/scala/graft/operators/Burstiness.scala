package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Term burstiness by Fano factor (Church & Gale, 1995): for each
  * frequent term, the variance-to-mean ratio of its per-document
  * frequency over the WHOLE corpus (absent docs count as zero — the
  * zeros are the point). Fano ≈ 1 is Poisson scatter (function
  * words); Fano ≫ 1 marks contagious/topical terms that pile into few
  * docs — the signal behind df-weighting choices and stop-list
  * construction in retrieval pipelines. Candidate terms are those
  * with collection frequency ≥ 100 (an absolute predicate, not a
  * rank, so the candidate set needs no global sort).
  *
  * Determinism: tf/cf and both power sums are exact integers; with N
  * the corpus size, mean = S/N and var = S2/N − (S/N)² are fixed-order
  * double expressions from exact sums, snapped.
  *
  * Scale: tokenize-explode → ONE (term, doc) hash aggregate → one
  * term-level aggregate; the zero-doc correction is algebra on N, not
  * a dense term×doc materialization. Top-20 plans as
  * TakeOrderedAndProject.
  */
object Burstiness {

  private val minCf = 100

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_term_burstiness",
      Some(s"""
        WITH nd AS (SELECT COUNT(*) AS n FROM documents),
        toks AS (
          SELECT doc_id, UNNEST(string_split(${sqlClean("text")}, ' ')) AS w
          FROM documents),
        tf AS (
          SELECT w, doc_id, COUNT(*) AS tf
          FROM toks WHERE w <> '' AND length(w) >= 3
          GROUP BY w, doc_id),
        ts AS (
          SELECT w, SUM(tf) AS cf, COUNT(*) AS df,
                 SUM(CAST(tf AS HUGEINT) * tf) AS s2
          FROM tf GROUP BY w
          HAVING SUM(tf) >= $minCf)
        SELECT w AS term, CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df,
               ${det.sqlSnap9(
          "(CAST(s2 AS DOUBLE) / nd.n" +
            " - (CAST(cf AS DOUBLE) / nd.n) * (CAST(cf AS DOUBLE) / nd.n))" +
            " / (CAST(cf AS DOUBLE) / nd.n)")} AS fano
        FROM ts CROSS JOIN nd
        ORDER BY fano DESC, term
        LIMIT 20
      """.trim),
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d)
        val nd = docs.agg(count(lit(1)).as("n"))
        val toks = docs.select($"doc_id",
            explode(split(cleanText($"text"), " ")).as("w"))
          .filter($"w" =!= "" && length($"w") >= 3)
        val tf = toks.groupBy($"w", $"doc_id").agg(count(lit(1)).as("tf"))
        val hug = $"tf".cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val ts = tf.groupBy($"w")
          .agg(sum($"tf").as("cf"), count(lit(1)).as("df"),
            sum(hug * $"tf").as("s2"))
          .filter($"cf" >= minCf)
        ts.crossJoin(broadcast(nd))
          .select($"w".as("term"), $"cf".cast("long").as("cf"),
            $"df".cast("long").as("df"),
            det.snap9(($"s2".cast("double") / $"n"
              - ($"cf".cast("double") / $"n") * ($"cf".cast("double") / $"n"))
              / ($"cf".cast("double") / $"n")).as("fano"))
          .orderBy($"fano".desc, $"term".asc)
          .limit(20)
      }))
}
