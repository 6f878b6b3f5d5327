package graft.operators

import graft.QueryDef
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's flagship retrieval pipeline `simple_rag`
  * (`/root/reference/utils.py:326-330`): tokenize the query once
  * driver-side, substring-score every record, deterministic top-k.
  *
  * Spark shape: clean + score are pure expression trees over the scan
  * (projection-pruned, codegen'd); `orderBy(...).limit(k)` plans as
  * TakeOrderedAndProject — per-partition heaps then a driver merge of k
  * rows, no global sort. That plan is scale-invariant: at 100 TB it is
  * one scan + k·partitions rows of driver traffic.
  */
object SimpleRag {

  /** simple_rag over any (id, text) relation. Returns the *cleaned* text
    * (reference quirk Q13) with the original id and the score. Ties are
    * broken by ascending id — reproduces Python's stable sort (Q5).
    */
  def topK(records: DataFrame, idCol: String, textCol: String,
           query: String, k: Int): DataFrame = {
    val keywords = getKeywords(cleanString(query))
    val cleaned: Column = cleanText(col(textCol))
    records
      .select(col(idCol), cleaned.as("cleaned"))
      .withColumn("score", keywordScore(col("cleaned"), keywords).cast("long"))
      .orderBy(desc("score"), asc(idCol))
      .limit(k)
  }

  /** Fixed corpus query used by the harness entry (documents table). */
  val harnessQuery = "the spark shuffle and join of a window merge"
  val harnessK = 25

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "rag_topk_documents", {
        val kws = getKeywords(cleanString(harnessQuery))
        Some(s"""
          SELECT doc_id, cleaned, score FROM (
            SELECT doc_id, ${sqlClean("text")} AS cleaned,
                   CAST(${sqlKeywordScore(sqlClean("text"), kws)} AS BIGINT) AS score
            FROM documents)
          ORDER BY score DESC, doc_id
          LIMIT $harnessK
        """.trim)
      },
      (s, d) => topK(documents(s, d), "doc_id", "text", harnessQuery, harnessK))
  )
}
