package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Label-error detection, confident-learning style (Northcutt et al.,
  * JAIR 2021 reduced to the centroid margin): a vector whose
  * embedding sits closer to ANOTHER class's centroid than to its own
  * is a labeling-error candidate, ranked by the margin — the label-QA
  * queue an annotation team actually reviews, and the complement of
  * pl_rater_kappa (which scores the raters; this scores individual
  * labels). Top-20 candidates by margin, with the rival class.
  *
  * Centroids use the sim_centroid_classify quantization (components
  * floored to 1e-6 ints before exact-mean aggregation) so the
  * centroid floats — and therefore every emitted cosine margin — are
  * bit-identical across engines.
  *
  * Determinism: quantized centroid construction as above; per-vector
  * cosines are identical-operand doubles; margins snapped; ranking
  * ties break on vec_id.
  *
  * Scale: one posexplode aggregate for |labels|·dim centroid cells, a
  * broadcast of |labels| vectors, a per-vector max over ≤|labels|
  * rivals, TakeOrderedAndProject for the queue.
  */
object LabelErrors {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_label_errors",
      Some("""
        WITH ex AS (
          SELECT label, t.d,
                 CAST(floor(embedding[t.d + 1] * CAST(1000000 AS DOUBLE)) AS BIGINT) AS qv
          FROM embeddings, range(0, 64) t(d)),
        lc AS (
          SELECT label, list(vr ORDER BY d) AS lemb FROM (
            SELECT label, d,
                   CAST(CAST(SUM(qv) AS DOUBLE) / COUNT(*) / CAST(1000000 AS DOUBLE) AS REAL) AS vr
            FROM ex GROUP BY label, d)
          GROUP BY label),
        sc AS (
          SELECT e.vec_id, e.label AS own_label, c.label AS clabel,
                 list_cosine_similarity(e.embedding::DOUBLE[], c.lemb::DOUBLE[]) AS ccos
          FROM embeddings e, lc c),
        own AS (
          SELECT vec_id, own_label, ccos AS own_cos
          FROM sc WHERE clabel = own_label),
        rival AS (
          SELECT vec_id, clabel AS rival_label, ccos AS rival_cos FROM (
            SELECT vec_id, clabel, ccos,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY ccos DESC, clabel) AS rn
            FROM sc WHERE clabel <> own_label)
          WHERE rn = 1),
        m AS (
          SELECT o.vec_id, o.own_label, r.rival_label,
                 r.rival_cos - o.own_cos AS margin_raw
          FROM own o JOIN rival r USING (vec_id))
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               CAST(own_label AS BIGINT) AS own_label,
               CAST(rival_label AS BIGINT) AS rival_label,
               round(margin_raw * 1e9) / 1e9 AS margin,
               margin_raw > 0 AS suspected_error
        FROM m
        ORDER BY margin_raw DESC, vec_id
        LIMIT 20
      """.trim),
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        val emb = embeddings(s, d)
        val lc = emb
          .select($"label", posexplode($"embedding").as(Seq("d", "v")))
          .select($"label", $"d", floor($"v" * 1000000.0).cast("long").as("qv"))
          .groupBy($"label", $"d")
          .agg((sum($"qv").cast("double") / count(lit(1)) / 1000000.0)
            .cast("float").as("vr"))
          .groupBy($"label")
          .agg(transform(array_sort(collect_list(struct($"d", $"vr"))),
            x => x.getField("vr")).as("lemb"))
          .select($"label".as("clabel"), $"lemb")
        val sc = emb.crossJoin(broadcast(lc))
          .select($"vec_id", $"label".as("own_label"), $"clabel",
            Similarity.cosineNative($"embedding", $"lemb").as("ccos"))
        val own = sc.filter($"clabel" === $"own_label")
          .select($"vec_id", $"own_label", $"ccos".as("own_cos"))
        val rival = sc.filter($"clabel" =!= $"own_label")
          .groupBy($"vec_id".as("r_vid"))
          .agg(max_by($"clabel", struct($"ccos", (-$"clabel").as("nl")))
            .as("rival_label"),
            max($"ccos").as("rival_cos"))
        own.join(rival, $"vec_id" === $"r_vid")
          .withColumn("margin_raw", $"rival_cos" - $"own_cos")
          .orderBy($"margin_raw".desc, $"vec_id")
          .limit(20)
          .select($"vec_id".cast("long").as("vec_id"),
            $"own_label".cast("long").as("own_label"),
            $"rival_label".cast("long").as("rival_label"),
            det.snap9($"margin_raw").as("margin"),
            ($"margin_raw" > 0).as("suspected_error"))
      }))
}
