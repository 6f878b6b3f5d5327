package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Range similarity search: ALL corpus vectors within cosine ≥ τ of
  * each query vector — the retrieval mode dedup/contamination scans
  * need (top-k truncates exactly the near-duplicates you came for;
  * a radius does not). The query block (vec_id < 5) broadcasts; the
  * corpus side stays partitioned, so the scan is one codegen'd pass,
  * embarrassingly parallel, with the selective cosine filter applied
  * before any shuffle (only hits reach the output sort). The IVF
  * bucketed variant of the same radius semantics is the
  * `dd_embedding_neardup_ivf` path; this is its exact-recall
  * baseline, priced per query block rather than per pair.
  */
object RangeSearch {

  private val minCos = 0.3

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_range_search",
      Some(s"""
        SELECT q.vec_id AS qid, c.vec_id AS vec_id,
               list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < 5 AND c.vec_id >= 5
        WHERE list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) >= $minCos
        ORDER BY qid, vec_id
      """.trim),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val emb = embeddings(s, d)
        val q = broadcast(emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb")))
        emb.filter(col("vec_id") >= 5)
          .crossJoin(q)
          .select(col("qid"), col("vec_id"),
            Similarity.cosineNative(col("qemb"), col("embedding")).as("cos"))
          .filter(col("cos") >= minCos)
          .orderBy(col("qid"), col("vec_id"))
      }))
}
