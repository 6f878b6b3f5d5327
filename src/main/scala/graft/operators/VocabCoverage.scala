package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary-size coverage sweep — the tokenizer-budget question every
  * training pipeline answers before fixing a vocab: what fraction of
  * token OCCURRENCES does a top-N type vocabulary cover, and what OOV
  * rate does each budget leave on the table (the empirical face of
  * Zipf's law; complements `ta_bpe_*`, which build subword units, and
  * `ta_zipf_*`, which fit the exponent).
  *
  * For N ∈ {100, 500, 1000, 2000}: covered occurrences, totals, the
  * coverage ratio and OOV rate, plus the type count actually available
  * (coverage saturates at 1 when the corpus vocabulary is smaller than
  * the budget — the row says so instead of lying with a clamp).
  *
  * Scale: one (token → count) aggregate; the rank window runs over the
  * top-2000 frequency rows ONLY (orderBy + limit before any window —
  * the FightinWords discipline), never the corpus vocabulary; totals
  * are one-row broadcast frames. Ties rank by (count DESC, token ASC)
  * — total and engine-identical.
  */
object VocabCoverage {

  private val BUDGETS = Seq(100, 500, 1000, 2000)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ta_vocab_coverage",
      Some(s"""
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS t
          FROM documents WHERE text IS NOT NULL),
        freq AS (
          SELECT t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY t),
        tot AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n_occ,
                 CAST(COUNT(*) AS BIGINT) AS n_types
          FROM freq),
        top AS (
          SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, t) AS rnk
          FROM freq ORDER BY c DESC, t LIMIT 2000),
        budgets AS (${BUDGETS.map(n => s"SELECT $n AS n").mkString(" UNION ALL ")}),
        cov AS (
          SELECT b.n,
                 CAST(SUM(CASE WHEN tp.rnk <= b.n THEN tp.c ELSE 0 END) AS BIGINT)
                   AS covered
          FROM budgets b CROSS JOIN top tp
          GROUP BY b.n)
        SELECT CAST(c.n AS BIGINT) AS vocab_budget,
               LEAST(CAST(c.n AS BIGINT), o.n_types) AS types_used,
               c.covered, o.n_occ AS total_occurrences,
               ${det.sqlSnap9("c.covered * 1.0 / o.n_occ")} AS coverage,
               ${det.sqlSnap9("1.0 - c.covered * 1.0 / o.n_occ")} AS oov_rate
        FROM cov c, tot o
        ORDER BY vocab_budget
      """.trim),
      (s, d) => {
        import s.implicits._
        val freq = documents(s, d)
          .filter(col("text").isNotNull)
          .select(explode(split(col("text"), " ")).as("t"))
          .filter(col("t") =!= "")
          .groupBy(col("t")).agg(count(lit(1)).as("c"))
          .localCheckpoint() // totals + the top-2000 rank
        val tot = freq.agg(sum(col("c")).cast("long").as("n_occ"),
          count(lit(1)).cast("long").as("n_types"))
        val top = freq.orderBy(col("c").desc, col("t")).limit(2000)
          .withColumn("rnk",
            row_number().over(Window.orderBy(col("c").desc, col("t"))))
        val budgets = BUDGETS.toDF("n")
        val cov = broadcast(budgets).crossJoin(top)
          .groupBy(col("n"))
          .agg(sum(when(col("rnk") <= col("n"), col("c")).otherwise(0L))
            .cast("long").as("covered"))
        cov.crossJoin(broadcast(tot))
          .select(col("n").cast("long").as("vocab_budget"),
            least(col("n").cast("long"), col("n_types")).as("types_used"),
            col("covered"), col("n_occ").as("total_occurrences"),
            det.snap9(col("covered") * 1.0 / col("n_occ")).as("coverage"),
            det.snap9(lit(1.0) - col("covered") * 1.0 / col("n_occ"))
              .as("oov_rate"))
          .orderBy(col("vocab_budget"))
      }))
}
