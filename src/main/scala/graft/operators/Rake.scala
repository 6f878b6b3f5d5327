package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** RAKE — Rapid Automatic Keyword Extraction (Rose et al., 2010):
  * candidate phrases are the maximal runs of non-stopword tokens
  * (stopwords and punctuation are the delimiters), each word scores
  * deg(w)/freq(w) over the candidate corpus (deg counts the lengths
  * of every phrase the word appears in — words that ride in long
  * collocations outrank frequent loners), and a phrase scores the sum
  * of its member word scores. The per-source top-5 multi-word
  * keyphrases — the extraction that feeds topic labeling and dataset
  * cards, complementary to ta_keywords_tfidf (single terms) and
  * ta_textrank (graph centrality).
  *
  * Determinism: phrase segmentation is an integer cumulative
  * delimiter count (keyed window); deg/freq are exact integers; each
  * word score is one int/int division (bit-identical), snapped only
  * when summed into phrase scores via DECIMAL(28,12); ranking ties
  * break on phrase text.
  *
  * Scale: tokenize-explode (linear), ONE keyed window per doc for
  * segmentation, hash aggregates for deg/freq and phrase scores, and
  * a per-source top-k window — no driver state, no global sort.
  */
object Rake {

  private val maxPhraseLen = 4

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_rake_phrases", {
        val sw = TextFunctions.englishStopwords.toSeq.sorted
          .map(w => s"'$w'").mkString(", ")
        Some(s"""
        WITH d AS (
          SELECT doc_id, source,
                 string_split(${sqlClean("text")}, ' ') AS tk
          FROM documents),
        ks AS (
          SELECT doc_id, source, tk,
                 UNNEST(range(1, len(tk) + 1)) AS k
          FROM d),
        toks AS (
          SELECT doc_id, source, k, tk[k] AS w,
                 CASE WHEN tk[k] = '' OR list_contains([$sw], tk[k])
                      THEN 1 ELSE 0 END AS is_delim
          FROM ks),
        seg AS (
          SELECT doc_id, source, k, w, is_delim,
                 SUM(is_delim) OVER (PARTITION BY doc_id ORDER BY k
                                     ROWS UNBOUNDED PRECEDING) AS ph
          FROM toks),
        members AS (
          SELECT doc_id, source, ph, k, w FROM seg WHERE is_delim = 0),
        phrases AS (
          SELECT doc_id, source, ph,
                 string_agg(w, ' ' ORDER BY k) AS phrase,
                 COUNT(*) AS plen
          FROM members GROUP BY doc_id, source, ph
          HAVING COUNT(*) BETWEEN 2 AND $maxPhraseLen),
        wscore AS (
          SELECT w,
                 CAST(SUM(p.plen) AS DOUBLE) / COUNT(*) AS ws
          FROM members m JOIN phrases p
            ON p.doc_id = m.doc_id AND p.ph = m.ph
          GROUP BY w),
        pscore AS (
          SELECT p.source, p.phrase,
                 CAST(SUM(CAST(${det.sqlSnap9("s.ws")} AS DECIMAL(28,12)))
                   AS DOUBLE) AS score
          FROM phrases p
          JOIN members m ON m.doc_id = p.doc_id AND m.ph = p.ph
          JOIN wscore s ON s.w = m.w
          GROUP BY p.source, p.phrase, p.doc_id, p.ph),
        agg AS (
          SELECT source, phrase, MAX(score) AS score, COUNT(*) AS n_occ
          FROM pscore GROUP BY source, phrase),
        ranked AS (
          SELECT source, phrase, score, n_occ,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY score DESC, phrase) AS rank
          FROM agg)
        SELECT source, CAST(rank AS BIGINT) AS rank, phrase,
               ${det.sqlSnap9("score")} AS score,
               CAST(n_occ AS BIGINT) AS n_occ
        FROM ranked WHERE rank <= 5
        ORDER BY source, rank
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val sw = TextFunctions.englishStopwords.toSeq.sorted
        val toks = documents(s, d)
          .select($"doc_id", $"source",
            posexplode(split(cleanText($"text"), " ")).as(Seq("k0", "w")))
          .select($"doc_id", $"source", ($"k0" + 1).as("k"), $"w",
            when($"w" === "" || $"w".isInCollection(sw), 1)
              .otherwise(0).as("is_delim"))
        val segW = Window.partitionBy($"doc_id").orderBy($"k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val seg = toks.withColumn("ph", sum($"is_delim").over(segW))
        val members = seg.filter($"is_delim" === 0)
          .select($"doc_id", $"source", $"ph", $"k", $"w")
        val phrases = members
          .groupBy($"doc_id", $"source", $"ph")
          .agg(array_join(transform(array_sort(collect_list(
              struct($"k", $"w"))), x => x("w")), " ").as("phrase"),
            count(lit(1)).as("plen"))
          .filter($"plen".between(2, maxPhraseLen))
        val wscore = members.as("m")
          .join(phrases.as("p"),
            $"p.doc_id" === $"m.doc_id" && $"p.ph" === $"m.ph")
          .groupBy($"m.w".as("sw_w"))
          .agg((sum($"p.plen").cast("double") / count(lit(1))).as("ws"))
        val pscore = phrases.as("p")
          .join(members.as("m"),
            $"m.doc_id" === $"p.doc_id" && $"m.ph" === $"p.ph")
          .join(wscore, $"sw_w" === $"m.w")
          .groupBy($"p.source", $"p.phrase", $"p.doc_id", $"p.ph")
          .agg(sum(det.snap9($"ws").cast(DecimalType(28, 12)))
            .cast("double").as("score"))
        val agg = pscore.groupBy($"source", $"phrase")
          .agg(max($"score").as("score"), count(lit(1)).as("n_occ"))
        val rw = Window.partitionBy($"source")
          .orderBy($"score".desc, $"phrase".asc)
        agg.withColumn("rank", row_number().over(rw))
          .filter($"rank" <= 5)
          .select($"source", $"rank".cast("long").as("rank"), $"phrase",
            det.snap9($"score").as("score"),
            $"n_occ".cast("long").as("n_occ"))
          .orderBy($"source", $"rank")
      }))
}
