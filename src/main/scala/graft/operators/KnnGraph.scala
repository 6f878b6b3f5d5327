package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutual k-NN graph construction over the embedding table — the
  * backbone of graph-based corpus curation (near-dup cluster seeding,
  * density-based quality scoring, label propagation over semantic
  * neighborhoods). An edge (u, v) exists iff v is in u's top-k AND u
  * is in v's top-k: the mutuality test turns the noisy directed kNN
  * into the sparse symmetric graph community detectors want.
  *
  * Three-query family, same pattern as the embedding near-dup trio:
  * `sim_knn_graph` is the exact formulation (all-pairs inside a
  * bounded sample — the oracle of record), `sim_knn_graph_ivf` is the
  * production scale path (multi-probe IVF buckets make the candidate
  * join n·bucket instead of n², so it survives an unbounded corpus),
  * and `sim_knn_graph_recall` prices the approximation as one checked
  * row of edge-set recall.
  */
object KnnGraph {

  /** Directed exhaustive scores within the bounded sample. */
  private def exactScored(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sample = embeddings(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    sample.select(col("vec_id").as("src"), col("embedding").as("e1"))
      .join(broadcast(sample.select(col("vec_id").as("dst"), col("embedding").as("e2"))),
        col("dst") =!= col("src"))
      .select(col("src"), col("dst"),
        Similarity.cosineNative(col("e1"), col("e2")).as("cos"))
  }

  /** Directed scores over multi-probe IVF candidate pairs only. */
  private def ivfScored(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val sample = embeddings(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val assigned = Similarity.ivfAssignTop(sample, nCentroids = 16, nAssign = 3).persist()
    assigned.select(col("centroid"), col("vec_id").as("src"), col("embedding").as("e1"))
      .join(assigned.select(col("centroid"), col("vec_id").as("dst"), col("embedding").as("e2")),
        Seq("centroid"))
      .filter(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .select(col("src"), col("dst"),
        Similarity.cosineNative(col("e1"), col("e2")).as("cos"))
  }

  /** Top-k per src, then the mutuality semi-join, canonicalized u<v. */
  private def mutualEdges(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("src")).orderBy(desc("cos"), asc("dst"))
    val topk = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("cos"))
      .persist()
    topk.as("x")
      .join(topk.select(col("dst").as("src"), col("src").as("dst")).as("y"),
        Seq("src", "dst"), "left_semi")
      .filter(col("src") < col("dst"))
      .select(col("src").cast("long").as("u"),
        col("dst").cast("long").as("v"), col("cos"))
  }

  private val sqlSample =
    "s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200)"

  private val sqlExactTopk = s"""
    $sqlSample,
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                        b.vec_id) AS rank
      FROM s a JOIN s b ON b.vec_id <> a.vec_id),
    topk AS (SELECT src, dst, cos FROM scored WHERE rank <= 5),
    edges AS (
      SELECT x.src AS u, x.dst AS v, x.cos
      FROM topk x JOIN topk y ON y.src = x.dst AND y.dst = x.src
      WHERE x.src < x.dst)"""

  private val sqlIvfTopk = s"""
    $sqlSample,
    cents AS (
      SELECT vec_id AS centroid, embedding AS cemb FROM s WHERE vec_id < 16),
    assigned AS (
      SELECT vec_id, embedding, centroid FROM (
        SELECT e.vec_id, e.embedding, c.centroid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) DESC,
                          c.centroid) AS rn
        FROM s e, cents c)
      WHERE rn <= 3),
    cand AS (
      SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
      FROM assigned a JOIN assigned b
        ON a.centroid = b.centroid AND b.vec_id <> a.vec_id),
    cscored AS (
      SELECT c.src, c.dst,
             list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) AS cos
      FROM cand c
      JOIN s x ON x.vec_id = c.src
      JOIN s y ON y.vec_id = c.dst),
    ctopk AS (
      SELECT src, dst, cos FROM (
        SELECT src, dst, cos,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rank
        FROM cscored)
      WHERE rank <= 5),
    cedges AS (
      SELECT x.src AS u, x.dst AS v, x.cos
      FROM ctopk x JOIN ctopk y ON y.src = x.dst AND y.dst = x.src
      WHERE x.src < x.dst)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_knn_graph",
      Some(s"""
        WITH $sqlExactTopk
        SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, cos
        FROM edges
        ORDER BY u, v
      """.trim),
      (s, d) => mutualEdges(exactScored(s, d), 5).orderBy(col("u"), col("v"))),

    QueryDef(
      "sim_knn_graph_ivf",
      Some(s"""
        WITH $sqlIvfTopk
        SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, cos
        FROM cedges
        ORDER BY u, v
      """.trim),
      (s, d) => mutualEdges(ivfScored(s, d), 5).orderBy(col("u"), col("v"))),

    QueryDef(
      "sim_knn_graph_recall",
      Some(s"""
        WITH $sqlExactTopk,
        ${sqlIvfTopk.trim.stripPrefix("s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),")}
        SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_exact,
               CAST((SELECT COUNT(*) FROM cedges) AS BIGINT) AS n_ivf,
               CAST((SELECT COUNT(*) FROM edges e
                     WHERE EXISTS (SELECT 1 FROM cedges c
                                   WHERE c.u = e.u AND c.v = e.v)) AS BIGINT) AS n_shared,
               CAST((SELECT COUNT(*) FROM edges e
                     WHERE EXISTS (SELECT 1 FROM cedges c
                                   WHERE c.u = e.u AND c.v = e.v)) AS DOUBLE)
                 / (SELECT COUNT(*) FROM edges) AS edge_recall
      """.trim),
      (s, d) => {
        val exact = mutualEdges(exactScored(s, d), 5)
          .select(col("u"), col("v")).persist()
        val ivf = mutualEdges(ivfScored(s, d), 5)
          .select(col("u"), col("v")).persist()
        val shared = exact.join(ivf, Seq("u", "v"), "left_semi")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(ivf.agg(count(lit(1)).as("n_ivf")))
          .crossJoin(shared.agg(count(lit(1)).as("n_shared")))
          .select(col("n_exact"), col("n_ivf"), col("n_shared"),
            (col("n_shared").cast("double") / col("n_exact")).as("edge_recall"))
      }))
}
