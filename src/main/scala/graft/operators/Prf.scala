package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Pseudo-relevance-feedback query expansion (Rocchio's "blind
  * feedback" move): retrieve the top-10 documents for the seed terms,
  * then rank the terms of that feedback set as expansion candidates —
  * high frequency inside the feedback docs, low document frequency in
  * the corpus. The ranking key is pure integers (tf in feedback desc,
  * corpus df asc, term), so no float leaves the engine. Dataflow: one
  * token explode feeding both the seed scoring and the corpus df
  * table, a 10-row broadcast of the feedback doc ids, and two
  * TakeOrderedAndProject top-ks — the df aggregate is the only
  * vocabulary-wide state at 100 TB, identical to [[Rag]]'s tf-idf
  * shape.
  */
object Prf {

  private val seeds = Seq("spark", "shuffle", "join")
  private val excluded = seeds ++ Seq("a", "the")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "rag_prf_expansion", {
        val seedList = seeds.map(t => s"'$t'").mkString(", ")
        val exclList = excluded.map(t => s"'$t'").mkString(", ")
        Some(s"""
          WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          hits AS (
            SELECT doc_id, COUNT(*) AS score FROM toks
            WHERE tok IN ($seedList) GROUP BY doc_id),
          fb AS (SELECT doc_id FROM hits ORDER BY score DESC, doc_id LIMIT 10),
          tf AS (
            SELECT tok, COUNT(*) AS tf_fb FROM toks JOIN fb USING (doc_id)
            WHERE tok NOT IN ($exclList) GROUP BY tok),
          df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df_corpus FROM toks GROUP BY tok)
          SELECT tok AS term, CAST(tf_fb AS BIGINT) AS tf_fb,
                 CAST(df_corpus AS BIGINT) AS df_corpus
          FROM tf JOIN df USING (tok)
          ORDER BY tf_fb DESC, df_corpus, term LIMIT 15
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val toks = documents(s, d)
          .select($"doc_id", explode(split($"text", " ")).as("tok"))
        val fb = toks.filter($"tok".isin(seeds: _*))
          .groupBy($"doc_id").agg(count(lit(1)).as("score"))
          .orderBy($"score".desc, $"doc_id").limit(10)
          .select($"doc_id")
        val tf = toks.join(broadcast(fb), "doc_id")
          .filter(!$"tok".isin(excluded: _*))
          .groupBy($"tok").agg(count(lit(1)).as("tf_fb"))
        val df = toks.groupBy($"tok").agg(count_distinct($"doc_id").as("df_corpus"))
        tf.join(df, "tok")
          .select($"tok".as("term"), $"tf_fb".cast("long").as("tf_fb"),
            $"df_corpus".cast("long").as("df_corpus"))
          .orderBy($"tf_fb".desc, $"df_corpus", $"term")
          .limit(15)
      }))
}
