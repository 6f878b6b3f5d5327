package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** "Fightin' Words" rising/falling terms (Monroe, Colaresi & Quinn,
  * Political Analysis 2008): the log-odds ratio of each term between
  * the first and second corpus half under a Dirichlet prior (the
  * corpus itself, α₀ = 500), z-scored by its estimated variance
  * 1/(c₁+α₁) + 1/(c₂+α₂) — THE principled trending-vocabulary
  * statistic: raw frequency ratios over-rank rare terms, the prior
  * shrinks exactly them. Top-10 rising and top-10 falling terms by z.
  *
  * Determinism: counts exact; priors are exact count ratios; each
  * log-odds/variance/z is one fixed-order double expression from
  * exact integers, snapped; ranking ties break on term.
  *
  * Scale: tokenize-explode → one (term, half) aggregate → term-level
  * algebra; top-k are rank windows over the frequent-term subset
  * (absolute cf ≥ 20 predicate, no global rank of the full vocab).
  */
object FightinWords {

  private val alpha0 = 500.0
  private val minCf = 20

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_fightin_words",
      Some(s"""
        WITH mid AS (
          SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
        toks AS (
          SELECT CASE WHEN doc_id < m THEN 0 ELSE 1 END AS half, w
          FROM (SELECT doc_id,
                       UNNEST(string_split(${sqlClean("text")}, ' ')) AS w
                FROM documents) t CROSS JOIN mid
          WHERE w <> ''),
        cnt AS (
          SELECT w,
                 SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c1,
                 SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c2
          FROM toks GROUP BY w),
        tot AS (
          SELECT SUM(c1) AS n1, SUM(c2) AS n2, SUM(c1 + c2) AS n0 FROM cnt),
        kept AS (
          SELECT cnt.w, cnt.c1, cnt.c2, tot.n1, tot.n2, tot.n0,
                 $alpha0 * (cnt.c1 + cnt.c2) * 1.0 / tot.n0 AS aw
          FROM cnt CROSS JOIN tot WHERE cnt.c1 + cnt.c2 >= $minCf),
        z AS (
          SELECT w, c1, c2,
                 ${det.sqlSnap9(
          "(ln((c2 + aw) / (n2 + " + alpha0 + " - c2 - aw))" +
            " - ln((c1 + aw) / (n1 + " + alpha0 + " - c1 - aw)))" +
            " / sqrt(1.0 / (c2 + aw) + 1.0 / (c1 + aw))")} AS zscore
          FROM kept),
        ranked AS (
          SELECT w, c1, c2, zscore,
                 ROW_NUMBER() OVER (ORDER BY zscore DESC, w) AS rise,
                 ROW_NUMBER() OVER (ORDER BY zscore ASC, w) AS fall
          FROM z)
        SELECT CASE WHEN rise <= 10 THEN 'rising' ELSE 'falling' END AS direction,
               CAST(CASE WHEN rise <= 10 THEN rise ELSE fall END AS BIGINT) AS rank,
               w AS term, CAST(c1 AS BIGINT) AS c_first,
               CAST(c2 AS BIGINT) AS c_second, zscore
        FROM ranked
        WHERE rise <= 10 OR fall <= 10
        ORDER BY direction, rank
      """.trim),
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d)
        val mid = docs.agg(expr("(min(doc_id) + max(doc_id)) div 2").as("m"))
        val toks = docs.crossJoin(broadcast(mid))
          .select(when($"doc_id" < $"m", 0).otherwise(1).as("half"),
            explode(split(cleanText($"text"), " ")).as("w"))
          .filter($"w" =!= "")
        val cnt = toks.groupBy($"w")
          .agg(sum(when($"half" === 0, 1).otherwise(0)).as("c1"),
            sum(when($"half" === 1, 1).otherwise(0)).as("c2"))
        val tot = cnt.agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
          sum($"c1" + $"c2").as("n0"))
        val kept = cnt.crossJoin(broadcast(tot))
          .filter($"c1" + $"c2" >= minCf)
          .withColumn("aw", lit(alpha0) * ($"c1" + $"c2") * lit(1.0) / $"n0")
        val z = kept.select($"w", $"c1", $"c2",
          det.snap9((log(($"c2" + $"aw") / ($"n2" + lit(alpha0) - $"c2" - $"aw"))
            - log(($"c1" + $"aw") / ($"n1" + lit(alpha0) - $"c1" - $"aw")))
            / sqrt(lit(1.0) / ($"c2" + $"aw") + lit(1.0) / ($"c1" + $"aw")))
            .as("zscore"))
        // top-k via orderBy+limit (TakeOrderedAndProject) — never a
        // rank window over the whole frequent vocabulary; the rank
        // column is assigned on the 10 surviving rows
        def top(dirName: String, ord: Seq[org.apache.spark.sql.Column]) =
          z.orderBy(ord: _*).limit(10)
            .withColumn("rank", row_number().over(Window.orderBy(ord: _*))
              .cast("long"))
            .select(lit(dirName).as("direction"), $"rank",
              $"w".as("term"), $"c1".cast("long").as("c_first"),
              $"c2".cast("long").as("c_second"), $"zscore")
        top("rising", Seq($"zscore".desc, $"w".asc))
          .unionByName(top("falling", Seq($"zscore".asc, $"w".asc)))
          .orderBy($"direction", $"rank")
      }))
}
