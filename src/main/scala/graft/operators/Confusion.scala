package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Language-ID confusion matrix — the model-quality rollup of
  * ta_ngram_lang_id's per-document guesses: counts per (true lang,
  * guessed lang) plus each true language's share of correct guesses.
  * This is the readout that decides whether a lang-ID gate is safe to
  * put in front of a mixture (a language the classifier confuses gets
  * silently filtered into the wrong bucket). Same trained-profile
  * dataflow (per-lang top-40 document-frequency trigrams, broadcast
  * profile join, argmax per doc), one extra integer aggregate.
  */
object Confusion {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ta_lang_confusion",
      Some("""
        WITH tg AS (
          SELECT doc_id, lang,
                 unnest(list_distinct(list_transform(
                   range(1, length(text) - 1), i -> substr(text, i, 3)))) AS tri
          FROM documents WHERE length(text) >= 3),
        prof AS (
          SELECT lang AS plang, tri FROM (
            SELECT lang, tri, COUNT(*) AS df,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY COUNT(*) DESC, tri) AS rn
            FROM tg GROUP BY lang, tri)
          WHERE rn <= 40),
        scored AS (
          SELECT t.doc_id, t.lang, p.plang, COUNT(*) AS overlap
          FROM tg t JOIN prof p ON t.tri = p.tri
          GROUP BY t.doc_id, t.lang, p.plang),
        best AS (
          SELECT doc_id, lang, plang AS guess FROM (
            SELECT doc_id, lang, plang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY overlap DESC, plang) AS rn
            FROM scored)
          WHERE rn = 1),
        conf AS (
          SELECT lang, guess, COUNT(*) AS n FROM best GROUP BY lang, guess),
        tot AS (SELECT lang, SUM(n) AS t FROM conf GROUP BY lang)
        SELECT c.lang AS true_lang, c.guess, CAST(c.n AS BIGINT) AS n,
               CAST(c.n AS DOUBLE) / tot.t AS share,
               c.lang = c.guess AS is_correct
        FROM conf c JOIN tot ON tot.lang = c.lang
        ORDER BY true_lang, guess
      """.trim),
      (s, d) => {
        import s.implicits._
        val tg = documents(s, d)
          .filter(length($"text") >= 3)
          .select($"doc_id", $"lang", explode(TextAnalysis.trigramUdf($"text")).as("tri"))
        val wProf = Window.partitionBy($"lang").orderBy(desc("df"), asc("tri"))
        val prof = tg.groupBy($"lang", $"tri").agg(count(lit(1)).as("df"))
          .withColumn("rn", row_number().over(wProf))
          .filter($"rn" <= 40)
          .select($"lang".as("plang"), $"tri")
        val scored = tg.join(broadcast(prof), "tri")
          .groupBy($"doc_id", $"lang", $"plang")
          .agg(count(lit(1)).as("overlap"))
        val wBest = Window.partitionBy($"doc_id").orderBy(desc("overlap"), asc("plang"))
        val best = scored.withColumn("rn", row_number().over(wBest))
          .filter($"rn" === 1)
          .select($"doc_id", $"lang", $"plang".as("guess"))
        val conf = best.groupBy($"lang", $"guess").agg(count(lit(1)).as("n"))
        val tot = conf.groupBy($"lang").agg(sum($"n").as("t"))
        conf.join(tot, Seq("lang"))
          .select($"lang".as("true_lang"), $"guess", $"n".cast("long").as("n"),
            ($"n".cast("double") / $"t").as("share"),
            ($"lang" === $"guess").as("is_correct"))
          .orderBy($"true_lang", $"guess")
      }))
}
