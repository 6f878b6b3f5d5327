package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two embedding-side training-data operators on the proven ANN
  * machinery:
  *
  * sim_hard_negatives — contrastive-training mining: for each query
  * vector, the top-5 most similar vectors with a DIFFERENT label.
  * These near-miss negatives are what make a contrastive batch
  * informative (random negatives are trivially separable). Bounded
  * query sample broadcast against one corpus scan, per-query top-k via
  * a rank window — the sim_cosine_topk shape plus a label-mismatch
  * predicate.
  *
  * sim_centroid_classify — the cheapest embedding classifier as a
  * quality probe: train-split label centroids (the exactly-portable
  * floor(v·10⁶) integer means — see [[Drift]]), held-out vectors
  * assigned to the argmax-cosine centroid, confusion accounting per
  * true label. Low accuracy for a label = its embedding region is not
  * separable — the signal that the label (or the embedding model)
  * needs work before it is used for mixture weighting. One broadcast
  * codebook, map-side argmax, integer counts. Measured here: held-out
  * accuracy ≈ random (labels on this corpus carry no geometric
  * structure — 1-NN label agreement is 10% ≈ chance, the same
  * property sim_label_knn already pins), while train-split accuracy
  * is 42% — the probe correctly separates in-sample memorization
  * from generalization.
  */
object HardNeg {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sim_hard_negatives",
      Some("""
        WITH q AS (
          SELECT vec_id AS qid, label AS qlabel, embedding AS qemb
          FROM embeddings WHERE vec_id < 20),
        scored AS (
          SELECT q.qid, e.vec_id AS nid, e.label AS neg_label,
                 list_cosine_similarity(q.qemb::DOUBLE[], e.embedding::DOUBLE[]) AS cos,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.qid
                   ORDER BY list_cosine_similarity(q.qemb::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                            e.vec_id) AS rank
          FROM q JOIN embeddings e ON e.label <> q.qlabel)
        SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
               CAST(nid AS BIGINT) AS nid, CAST(neg_label AS BIGINT) AS neg_label, cos
        FROM scored WHERE rank <= 5
        ORDER BY qid, rank
      """.trim),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val emb = embeddings(s, d)
        val q = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"),
            col("embedding").as("qemb"))
        val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))
        broadcast(q)
          .join(emb, col("label") =!= col("qlabel"))
          .select(col("qid"), col("vec_id").as("nid"), col("label").as("neg_label"),
            Similarity.cosineNative(col("qemb"), col("embedding")).as("cos"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("qid").cast("long").as("qid"), col("rank").cast("long").as("rank"),
            col("nid").cast("long").as("nid"),
            col("neg_label").cast("long").as("neg_label"), col("cos"))
          .orderBy(col("qid"), col("rank"))
      }),

    QueryDef(
      "sim_centroid_classify",
      Some("""
        WITH ex AS (
          SELECT label, t.d,
                 CAST(floor(embedding[t.d + 1] * CAST(1000000 AS DOUBLE)) AS BIGINT) AS qv
          FROM embeddings, range(0, 64) t(d)
          WHERE vec_id % 10 <> 0),
        lc AS (
          SELECT label, list(vr ORDER BY d) AS lemb FROM (
            SELECT label, d,
                   CAST(CAST(SUM(qv) AS DOUBLE) / COUNT(*) / CAST(1000000 AS DOUBLE) AS REAL) AS vr
            FROM ex GROUP BY label, d)
          GROUP BY label),
        pred AS (
          SELECT vec_id, tlabel, plabel FROM (
            SELECT e.vec_id, e.label AS tlabel, c.label AS plabel,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.lemb::DOUBLE[]) DESC,
                              c.label) AS rn
            FROM embeddings e, lc c
            WHERE e.vec_id % 10 = 0)
          WHERE rn = 1)
        SELECT CAST(tlabel AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN plabel = tlabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(SUM(CASE WHEN plabel = tlabel THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS acc
        FROM pred
        GROUP BY tlabel
        ORDER BY label
      """.trim),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val emb = embeddings(s, d)
        val lc = emb.filter(col("vec_id") % 10 =!= 0)
          .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
          .select(col("label"), col("d"),
            floor(col("v") * 1000000.0).cast("long").as("qv"))
          .groupBy(col("label"), col("d"))
          .agg((sum(col("qv")).cast("double") / count(lit(1)) / 1000000.0)
            .cast("float").as("vr"))
          .groupBy(col("label"))
          .agg(transform(array_sort(collect_list(struct(col("d"), col("vr")))),
            x => x.getField("vr")).as("lemb"))
          .select(col("label").as("clabel"), col("lemb"))
        // argmax via max_by over (cos, -label): collapses map-side, one
        // row per test vector reaches the shuffle (the IVF-assignment
        // trick)
        val pred = emb.filter(col("vec_id") % 10 === 0)
          .crossJoin(broadcast(lc))
          .select(col("vec_id"), col("label").as("tlabel"), col("clabel"),
            Similarity.cosineNative(col("embedding"), col("lemb")).as("ccos"))
          .groupBy(col("vec_id"), col("tlabel"))
          .agg(max_by(col("clabel"),
            struct(col("ccos"), (-col("clabel")).as("nl"))).as("plabel"))
        pred.groupBy(col("tlabel").cast("long").as("label"))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("plabel") === col("tlabel"), 1).otherwise(0)).cast("long").as("n_correct"),
            (sum(when(col("plabel") === col("tlabel"), 1).otherwise(0)).cast("double") /
              count(lit(1))).as("acc"))
          .orderBy(col("label"))
      }))
}
