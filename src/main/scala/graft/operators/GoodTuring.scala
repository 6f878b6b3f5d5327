package graft.operators

import graft.QueryDef
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Good–Turing frequency-of-frequencies profile per source (Good,
  * Biometrika 1953): N_r = how many word types occur exactly r times,
  * for r ≤ 5, plus the Turing unseen-mass estimate P₀ = N₁/N — the
  * probability the NEXT token is a previously-unseen type. The number
  * that calibrates LM smoothing and answers "how much more corpus
  * would still teach new vocabulary" during data collection; rising
  * N₁/N across crawl snapshots means the source isn't mined out.
  *
  * Determinism: pure integer counting; P₀ is one exact-int ratio
  * (bit-identical unsnapped).
  *
  * Scale: tokenize-explode → (source, word) aggregate → (source, tf)
  * aggregate — the frequency-of-frequencies table is two hash
  * aggregates, each with map-side combine.
  */
object GoodTuring {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_good_turing",
      Some(s"""
        WITH toks AS (
          SELECT source, UNNEST(string_split(${sqlClean("text")}, ' ')) AS w
          FROM documents),
        tf AS (
          SELECT source, w, COUNT(*) AS r
          FROM toks WHERE w <> '' GROUP BY source, w),
        tot AS (
          SELECT source, SUM(r) AS n_tokens, COUNT(*) AS n_types
          FROM tf GROUP BY source),
        fof AS (
          SELECT source,
                 SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS n1,
                 SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS n2,
                 SUM(CASE WHEN r = 3 THEN 1 ELSE 0 END) AS n3,
                 SUM(CASE WHEN r = 4 THEN 1 ELSE 0 END) AS n4,
                 SUM(CASE WHEN r = 5 THEN 1 ELSE 0 END) AS n5
          FROM tf GROUP BY source)
        SELECT t.source,
               CAST(t.n_tokens AS BIGINT) AS n_tokens,
               CAST(t.n_types AS BIGINT) AS n_types,
               CAST(f.n1 AS BIGINT) AS n1, CAST(f.n2 AS BIGINT) AS n2,
               CAST(f.n3 AS BIGINT) AS n3, CAST(f.n4 AS BIGINT) AS n4,
               CAST(f.n5 AS BIGINT) AS n5,
               f.n1 * 1.0 / t.n_tokens AS unseen_mass
        FROM tot t JOIN fof f ON f.source = t.source
        ORDER BY t.source
      """.trim),
      (s, d) => {
        import s.implicits._
        val toks = documents(s, d)
          .select($"source", explode(split(cleanText($"text"), " ")).as("w"))
          .filter($"w" =!= "")
        val tf = toks.groupBy($"source", $"w").agg(count(lit(1)).as("r"))
        val tot = tf.groupBy($"source".as("t_src"))
          .agg(sum($"r").as("n_tokens"), count(lit(1)).as("n_types"))
        val fof = tf.groupBy($"source")
          .agg(
            sum(when($"r" === 1, 1).otherwise(0)).as("n1"),
            sum(when($"r" === 2, 1).otherwise(0)).as("n2"),
            sum(when($"r" === 3, 1).otherwise(0)).as("n3"),
            sum(when($"r" === 4, 1).otherwise(0)).as("n4"),
            sum(when($"r" === 5, 1).otherwise(0)).as("n5"))
        tot.join(fof, $"source" === $"t_src")
          .select($"source",
            $"n_tokens".cast("long").as("n_tokens"),
            $"n_types".cast("long").as("n_types"),
            $"n1".cast("long").as("n1"), $"n2".cast("long").as("n2"),
            $"n3".cast("long").as("n3"), $"n4".cast("long").as("n4"),
            $"n5".cast("long").as("n5"),
            ($"n1" * lit(1.0) / $"n_tokens").as("unseen_mass"))
          .orderBy($"source")
      }))
}
