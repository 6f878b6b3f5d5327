package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Out-of-distribution scoring against the label-centroid codebook —
  * the embedding-side data-cleaning gate: a vector whose best centroid
  * cosine is low belongs to no known mode (mislabeled, novel domain,
  * or garbage), and a curation pipeline routes it to review instead of
  * training. Centroids are the exactly-portable quantized means from
  * [[Drift]] (floor(v·10⁶) integer sums — see there for why raw float
  * means are not cross-engine stable); scoring is one broadcast cross
  * join + a per-vector max, i.e. the IVF assignment shape, so cost is
  * corpus × labels with no shuffle beyond the centroid aggregate.
  *
  * Output is the per-label OOD audit: how many of each label's own
  * vectors fall below the threshold against ALL centroids (their own
  * included) — a label with a high OOD rate is internally incoherent.
  */
object Ood {

  // measured best-centroid cosine at sf0.01: p5 ≈ 0.10, median ≈ 0.21
  // — 0.1 flags the ~5% least attached vectors, the review-queue rate
  // a curation run actually wants
  private val TAU = 0.1

  /** Shared CTE: exactly-portable per-label centroids (see Drift). */
  private[operators] val centroidCte = """
        ex AS (
          SELECT label, vec_id, t.d,
                 CAST(floor(embedding[t.d + 1] * CAST(1000000 AS DOUBLE)) AS BIGINT) AS qv
          FROM embeddings, range(0, 64) t(d)),
        lc AS (
          SELECT label, list(vr ORDER BY d) AS lemb FROM (
            SELECT label, d,
                   CAST(CAST(SUM(qv) AS DOUBLE) / COUNT(*) / CAST(1000000 AS DOUBLE) AS REAL) AS vr
            FROM ex GROUP BY label, d)
          GROUP BY label)"""

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sim_ood_score",
      Some(s"""
        WITH $centroidCte,
        best AS (
          SELECT e.vec_id, e.label,
                 MAX(list_cosine_similarity(e.embedding::DOUBLE[], c.lemb::DOUBLE[])) AS best_cos
          FROM embeddings e, lc c
          GROUP BY e.vec_id, e.label)
        SELECT CAST(label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(CASE WHEN best_cos < $TAU THEN 1 ELSE 0 END) AS BIGINT) AS n_ood,
               CAST(SUM(CASE WHEN best_cos < $TAU THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS ood_rate
        FROM best
        GROUP BY label
        ORDER BY label
      """.trim),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val emb = embeddings(s, d)
        val ex = emb
          .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
          .select(col("label"), col("d"),
            floor(col("v") * 1000000.0).cast("long").as("qv"))
        val lc = ex.groupBy(col("label"), col("d"))
          .agg((sum(col("qv")).cast("double") / count(lit(1)) / 1000000.0)
            .cast("float").as("vr"))
          .groupBy(col("label"))
          .agg(transform(array_sort(collect_list(struct(col("d"), col("vr")))),
            x => x.getField("vr")).as("lemb"))
          .select(col("lemb"))
        // max over the centroid candidates collapses map-side (the
        // nearestCentroid trick): the shuffle carries one row per vector
        val best = emb.crossJoin(broadcast(lc))
          .select(col("vec_id"), col("label"),
            Similarity.cosineNative(col("embedding"), col("lemb")).as("ccos"))
          .groupBy(col("vec_id"), col("label"))
          .agg(max(col("ccos")).as("best_cos"))
        best.groupBy(col("label").cast("long").as("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("best_cos") < TAU, 1).otherwise(0)).cast("long").as("n_ood"),
            (sum(when(col("best_cos") < TAU, 1).otherwise(0)).cast("double") /
              count(lit(1))).as("ood_rate"))
          .orderBy(col("label"))
      }))
}
