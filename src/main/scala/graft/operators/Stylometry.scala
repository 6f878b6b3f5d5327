package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Burrows' Delta (Burrows 2002) between sources — the standard
  * stylometric / authorship-attribution distance: for the corpus's
  * top-30 function words, z-score each source's relative frequency
  * against the across-source distribution, and Delta(a,b) is the mean
  * |z_a − z_b|. Near-zero Delta between two "different" sources is
  * the classic signature of one crawler feeding both (or a template
  * farm) — the provenance audit a curation pipeline runs before
  * trusting source labels as diversity strata.
  *
  * Determinism: counts integer; relative frequencies are per-row
  * doubles snapped before the across-source DECIMAL moment sums;
  * variance is the (q − s²/n)/n moment form in fixed order; z and the
  * |z_a − z_b| terms are snapped and DECIMAL-summed.
  *
  * Scale: one token count per (source, word) (map-side combined, the
  * word list is a 30-entry broadcast), moments over |sources| rows,
  * and a |sources|²·30 pair fan-out — bounded by the source
  * vocabulary, not the corpus.
  */
object Stylometry {

  private val topWords = 30
  private val topPairs = 15

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_burrows_delta", {
        val sw = graft.functions.TextFunctions.englishStopwords.toSeq.sorted
          .map(w => s"'$w'").mkString(", ")
        Some(s"""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        fw AS (
          SELECT tok, COUNT(*) AS f FROM toks
          WHERE list_contains([$sw], tok)
          GROUP BY tok ORDER BY f DESC, tok LIMIT $topWords),
        srctot AS (
          SELECT source, COUNT(*) AS total FROM toks GROUP BY source),
        cnt AS (
          SELECT t.source, t.tok, COUNT(*) AS c
          FROM toks t JOIN fw ON fw.tok = t.tok
          GROUP BY t.source, t.tok),
        -- dense grid: every (source, word) pair, zero-filled
        grid AS (
          SELECT s.source, fw.tok, s.total, COALESCE(c.c, 0) AS c
          FROM srctot s CROSS JOIN fw
          LEFT JOIN cnt c ON c.source = s.source AND c.tok = fw.tok),
        freq AS (
          SELECT source, tok,
                 ${det.sqlSnap9("c * 1.0 / total")} AS f
          FROM grid),
        mom AS (
          SELECT tok, COUNT(*) AS n,
                 CAST(SUM(CAST(f AS DECIMAL(38,12))) AS DOUBLE) AS sf,
                 CAST(SUM(CAST(${det.sqlSnap9("f * f")} AS DECIMAL(38,12))) AS DOUBLE) AS qf
          FROM freq GROUP BY tok),
        z AS (
          SELECT freq.source, freq.tok,
                 ${det.sqlSnap9(
          "(f - sf / n) / NULLIF(sqrt((qf - sf * sf / n) / n), 0)")} AS z
          FROM freq JOIN mom ON mom.tok = freq.tok),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(${det.sqlSnap9("abs(a.z - b.z)")} AS DECIMAL(38,12)) AS term
          FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source)
        SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_words,
               ${det.sqlSnap9(s"CAST(SUM(term) AS DOUBLE) / COUNT(*)")} AS delta
        FROM pairs
        GROUP BY src_a, src_b
        ORDER BY delta, src_a, src_b
        LIMIT $topPairs
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val stop = graft.functions.TextFunctions.englishStopwords.toSeq.sorted
        val toks = documents(s, d)
          .select($"source", explode(split($"text", " ")).as("tok"))
        val fw = toks.filter($"tok".isInCollection(stop))
          .groupBy($"tok").agg(count(lit(1)).as("f"))
          .orderBy($"f".desc, $"tok").limit(topWords)
        val srctot = toks.groupBy($"source").agg(count(lit(1)).as("total"))
        val cnt = toks.join(broadcast(fw.select($"tok")), "tok")
          .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
        val grid = srctot.crossJoin(broadcast(fw.select($"tok")))
          .join(cnt, Seq("source", "tok"), "left")
          .select($"source", $"tok", $"total", coalesce($"c", lit(0L)).as("c"))
        val freq = grid.select($"source", $"tok",
          det.snap9($"c" * lit(1.0) / $"total").as("f"))
        val mom = freq.groupBy($"tok".as("m_tok"))
          .agg(count(lit(1)).as("n"),
            sum($"f".cast(DecimalType(38, 12))).cast("double").as("sf"),
            sum(det.snap9($"f" * $"f").cast(DecimalType(38, 12)))
              .cast("double").as("qf"))
        val z = freq.join(broadcast(mom), $"tok" === $"m_tok")
          .select($"source", $"tok",
            det.snap9(($"f" - $"sf" / $"n")
              / nullif(sqrt(($"qf" - $"sf" * $"sf" / $"n") / $"n"), lit(0.0)))
              .as("z"))
        val pairs = z.as("a").join(z.as("b"),
            $"a.tok" === $"b.tok" && $"a.source" < $"b.source")
          .select($"a.source".as("src_a"), $"b.source".as("src_b"),
            det.snap9(abs($"a.z" - $"b.z"))
              .cast(DecimalType(38, 12)).as("term"))
        pairs.groupBy($"src_a", $"src_b")
          .agg(count(lit(1)).as("n_words"),
            sum($"term").cast("double").as("sd"))
          .select($"src_a", $"src_b", $"n_words".cast("long").as("n_words"),
            det.snap9($"sd" / $"n_words").as("delta"))
          .orderBy($"delta", $"src_a", $"src_b")
          .limit(topPairs)
      }))
}
