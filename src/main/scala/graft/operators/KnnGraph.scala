package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutual k-NN graph construction over the embedding table — the
  * backbone of graph-based corpus curation (near-dup cluster seeding,
  * density-based quality scoring, label propagation over semantic
  * neighborhoods). An edge (u, v) exists iff v is in u's top-k AND u
  * is in v's top-k: the mutuality test turns the noisy directed kNN
  * into the sparse symmetric graph community detectors want.
  *
  * Scale shape: the quadratic all-pairs scoring runs inside a BOUNDED
  * node sample (the broadcast side), exactly like sim_cosine_topk; at
  * corpus scale the sample is replaced by the IVF/LSH bucket join
  * (sim_ivf_ann) feeding the same top-k + mutuality tail, which is
  * per-node bounded (≤ k candidates each) and shuffles on vec_id only.
  */
object KnnGraph {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_knn_graph",
      Some("""
        WITH s AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        scored AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos,
                 ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                            b.vec_id) AS rank
          FROM s a JOIN s b ON b.vec_id <> a.vec_id),
        topk AS (SELECT src, dst, cos FROM scored WHERE rank <= 5)
        SELECT CAST(x.src AS BIGINT) AS u, CAST(x.dst AS BIGINT) AS v, x.cos
        FROM topk x JOIN topk y ON y.src = x.dst AND y.dst = x.src
        WHERE x.src < x.dst
        ORDER BY u, v
      """.trim),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val sample = embeddings(s, d).filter(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding"))
        val scored = sample.select(col("vec_id").as("src"), col("embedding").as("e1"))
          .join(broadcast(sample.select(col("vec_id").as("dst"), col("embedding").as("e2"))),
            col("dst") =!= col("src"))
          .select(col("src"), col("dst"),
            Similarity.cosineNative(col("e1"), col("e2")).as("cos"))
        val w = Window.partitionBy(col("src")).orderBy(desc("cos"), asc("dst"))
        val topk = scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("src"), col("dst"), col("cos"))
          .persist()
        topk.as("x")
          .join(topk.select(col("dst").as("src"), col("src").as("dst")).as("y"),
            Seq("src", "dst"), "left_semi")
          .filter(col("src") < col("dst"))
          .select(col("src").cast("long").as("u"),
            col("dst").cast("long").as("v"), col("cos"))
          .orderBy(col("u"), col("v"))
      }))
}
