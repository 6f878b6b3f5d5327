package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k MinHash Jaccard estimation between sources, with the
  * estimation error measured against exact overlap — the sketch-side
  * answer to "how much do these two crawls overlap?" that runs on 64
  * rows per source instead of the full vocabularies. The estimator is
  * the classic bottom-k merge (Broder's single-hash MinHash): rank the
  * UNION of two sketches by hash, keep the k smallest, estimate
  * J ≈ |members present in both sketches| / k. Exact Jaccard of the
  * per-source distinct bigram sets is computed alongside, so the
  * harness reports the error instead of asserting it.
  *
  * Scale shape: the per-source sketch is a bounded top-k (64 rows per
  * source forever — the corpus scan is the only full pass); every
  * pair-level step runs on sketch-sized data. The exact side is the
  * harness truth, a vocabulary self-join — at 100 TB you'd keep only
  * the sketches and drop the truth column, which is the point.
  *
  * Token unit is word BIGRAMS: this corpus's unigram vocabulary per
  * source (~31) is smaller than k, which would make the sketch exact
  * and the harness vacuous; bigrams (~700/source) exercise real
  * sketch error.
  */
object SketchJaccard {

  private val K = 64

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sk_minhash_jaccard", {
        val h = PortableHash.sqlH32("b")
        Some(s"""
        WITH toks AS (
          SELECT source, string_split(text, ' ') AS tk FROM documents),
        bg AS (
          SELECT DISTINCT source, tk[i] || ' ' || tk[i + 1] AS b
          FROM (SELECT source, tk, unnest(range(1, len(tk))) AS i FROM toks)),
        hb AS (SELECT source, b, $h AS h FROM bg),
        sk AS (
          SELECT source, b, h FROM (
            SELECT source, b, h,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, b) AS rn
            FROM hb)
          WHERE rn <= $K),
        srcs AS (SELECT DISTINCT source FROM bg),
        pairs AS (
          SELECT a.source AS sa, c.source AS sb
          FROM srcs a JOIN srcs c ON a.source < c.source),
        u AS (
          SELECT p.sa, p.sb, s.b, s.h,
                 MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS in_a,
                 MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS in_b
          FROM pairs p
          JOIN sk s ON s.source = p.sa OR s.source = p.sb
          GROUP BY p.sa, p.sb, s.b, s.h),
        merged AS (
          SELECT sa, sb, in_a, in_b FROM (
            SELECT sa, sb, in_a, in_b,
                   ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h, b) AS rn
            FROM u)
          WHERE rn <= $K),
        est AS (
          SELECT sa, sb,
                 CAST(SUM(in_a * in_b) AS DOUBLE) / COUNT(*) AS est_j
          FROM merged GROUP BY sa, sb),
        sizes AS (SELECT source, COUNT(*) AS n FROM bg GROUP BY source),
        inter AS (
          SELECT x.source AS sa, y.source AS sb, COUNT(*) AS i
          FROM bg x JOIN bg y ON x.b = y.b AND x.source < y.source
          GROUP BY x.source, y.source)
        SELECT p.sa AS source_a, p.sb AS source_b,
               est.est_j AS est_jaccard,
               CAST(COALESCE(i.i, 0) AS DOUBLE)
                 / (na.n + nb.n - COALESCE(i.i, 0)) AS exact_jaccard,
               abs(est.est_j - CAST(COALESCE(i.i, 0) AS DOUBLE)
                 / (na.n + nb.n - COALESCE(i.i, 0))) AS abs_err
        FROM pairs p
        JOIN est ON est.sa = p.sa AND est.sb = p.sb
        JOIN sizes na ON na.source = p.sa
        JOIN sizes nb ON nb.source = p.sb
        LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
        ORDER BY source_a, source_b
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val bg = documents(s, d)
          .select($"source", split($"text", " ").as("tk"))
          .filter(size($"tk") >= 2)
          .select($"source", explode(transform(
            sequence(lit(0), size($"tk") - 2),
            i => concat(element_at($"tk", i + 1), lit(" "),
              element_at($"tk", i + 2)))).as("b"))
          .distinct()
          .localCheckpoint()
        val hb = bg.select($"source", $"b", PortableHash.h32($"b").as("h"))
        val wsk = Window.partitionBy($"source").orderBy($"h", $"b")
        val sk = hb.withColumn("rn", row_number().over(wsk))
          .filter($"rn" <= K).select($"source", $"b", $"h")
          .localCheckpoint()
        val srcs = bg.select($"source").distinct()
        val pairs = srcs.as("pa").select($"source".as("sa"))
          .join(srcs.as("pb").select($"source".as("sb")), $"sa" < $"sb")
        val u = broadcast(pairs)
          .join(sk, $"source" === $"sa" || $"source" === $"sb")
          .groupBy($"sa", $"sb", $"b", $"h")
          .agg(max(when($"source" === $"sa", 1).otherwise(0)).as("in_a"),
            max(when($"source" === $"sb", 1).otherwise(0)).as("in_b"))
        val wm = Window.partitionBy($"sa", $"sb").orderBy($"h", $"b")
        val est = u.withColumn("rn", row_number().over(wm))
          .filter($"rn" <= K)
          .groupBy($"sa", $"sb")
          .agg((sum($"in_a" * $"in_b").cast("double") / count(lit(1))).as("est_j"))
        val sizes = bg.groupBy($"source").agg(count(lit(1)).as("n"))
        val inter = bg.select($"source".as("xs"), $"b")
          .join(bg.select($"source".as("ys"), $"b"), Seq("b"))
          .filter($"xs" < $"ys")
          .groupBy($"xs".as("sa"), $"ys".as("sb"))
          .agg(count(lit(1)).as("i"))
        val exact = pairs
          .join(est, Seq("sa", "sb"))
          .join(sizes.select($"source".as("sa"), $"n".as("na")), Seq("sa"))
          .join(sizes.select($"source".as("sb"), $"n".as("nb")), Seq("sb"))
          .join(inter, Seq("sa", "sb"), "left")
        val exJ = coalesce($"i", lit(0L)).cast("double") /
          ($"na" + $"nb" - coalesce($"i", lit(0L)))
        exact.select($"sa".as("source_a"), $"sb".as("source_b"),
            $"est_j".as("est_jaccard"), exJ.as("exact_jaccard"),
            abs($"est_j" - exJ).as("abs_err"))
          .orderBy($"source_a", $"source_b")
      }))
}
