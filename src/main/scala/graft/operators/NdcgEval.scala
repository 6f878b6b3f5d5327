package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** NDCG@10 retrieval-quality evaluation (Järvelin & Kekäläinen, TOIS
  * 2002, linear-gain form): score a SYSTEM ranking (keyword hits
  * normalized by √doc-length — the length-corrected retriever)
  * against graded relevance (raw keyword hits) — DCG with the
  * standard 1/log₂(rank+1) discounts, IDCG from the best possible
  * top-10, NDCG their ratio. The metric every retriever change ships
  * with; here the harness question is "how much relevance does length
  * normalization give up at the top".
  *
  * Determinism: relevance grades are exact integers; both rankings
  * order on exact-operand doubles with doc_id tiebreaks; the discount
  * weights are quoted literals; gains are snapped and folded in
  * DECIMAL; NDCG is an exact-sum ratio.
  *
  * Scale: two expression-only scans + two TakeOrderedAndProject
  * top-10s + a 10-row fold — no shuffle beyond the top-k driver
  * merges.
  */
object NdcgEval {

  private val k = 10
  // 1/log2(rank+1) for ranks 1..10, shortest-round-trip literals
  private val disc: Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "rag_ndcg_eval", {
        val kws = getKeywords(cleanString(SimpleRag.harnessQuery))
        val score = sqlKeywordScore(sqlClean("text"), kws)
        val discRows = disc.zipWithIndex
          .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
        Some(s"""
        WITH scored AS (
          SELECT doc_id,
                 CAST($score AS BIGINT) AS rel,
                 CAST($score AS BIGINT)
                   / sqrt(len(string_split(${sqlClean("text")}, ' '))) AS sys
          FROM documents),
        d(rank, w) AS (VALUES $discRows),
        sys_top AS (
          SELECT rel, ROW_NUMBER() OVER (ORDER BY sys DESC, doc_id) AS rank
          FROM scored ORDER BY sys DESC, doc_id LIMIT $k),
        ideal_top AS (
          SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rank
          FROM scored ORDER BY rel DESC, doc_id LIMIT $k),
        dcg AS (
          SELECT CAST(SUM(CAST(${det.sqlSnap9("s.rel * d.w")}
                   AS DECIMAL(28,12))) AS DOUBLE) AS dcg
          FROM sys_top s JOIN d ON d.rank = s.rank),
        idcg AS (
          SELECT CAST(SUM(CAST(${det.sqlSnap9("i.rel * d.w")}
                   AS DECIMAL(28,12))) AS DOUBLE) AS idcg
          FROM ideal_top i JOIN d ON d.rank = i.rank)
        SELECT CAST($k AS BIGINT) AS k,
               ${det.sqlSnap9("dcg.dcg")} AS dcg,
               ${det.sqlSnap9("idcg.idcg")} AS idcg,
               ${det.sqlSnap9("dcg.dcg / idcg.idcg")} AS ndcg
        FROM dcg CROSS JOIN idcg
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val kws = getKeywords(cleanString(SimpleRag.harnessQuery))
        val scored = documents(s, d).select($"doc_id",
          keywordScore(cleanText($"text"), kws).cast("long").as("rel"),
          (keywordScore(cleanText($"text"), kws).cast("long")
            / sqrt(size(split(cleanText($"text"), " ")))).as("sys"))
        val dDf = disc.zipWithIndex
          .map { case (w, i) => ((i + 1).toLong, w) }.toDF("rank", "w")
        val sysTop = scored.orderBy($"sys".desc, $"doc_id").limit(k)
          .select($"rel",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy($"sys".desc, $"doc_id")).cast("long").as("rank"))
        val idealTop = scored.orderBy($"rel".desc, $"doc_id").limit(k)
          .select($"rel",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy($"rel".desc, $"doc_id")).cast("long").as("rank"))
        val dcg = sysTop.join(broadcast(dDf), "rank")
          .agg(sum(det.snap9($"rel" * $"w").cast(DecimalType(28, 12)))
            .cast("double").as("dcg"))
        val idcg = idealTop.join(broadcast(dDf), "rank")
          .agg(sum(det.snap9($"rel" * $"w").cast(DecimalType(28, 12)))
            .cast("double").as("idcg"))
        dcg.crossJoin(idcg)
          .select(lit(k.toLong).as("k"),
            det.snap9($"dcg").as("dcg"), det.snap9($"idcg").as("idcg"),
            det.snap9($"dcg" / $"idcg").as("ndcg"))
      }))
}
