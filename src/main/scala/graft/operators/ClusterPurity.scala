package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** External cluster validation of the IVF-flat quantizer against the
  * embeddings' ground-truth labels: per-cluster majority label and
  * purity, corpus purity, and normalized mutual information
  * NMI = 2·I(C;L)/(H(C)+H(L)) from the full contingency table —
  * the label-side complement of sim_silhouette's geometry-side score
  * (high silhouette + low NMI = tight clusters around the WRONG
  * structure). Assignment shares the deterministic first-k centroids
  * with sim_silhouette (bit-identical corpus floats in both engines).
  *
  * Determinism: the contingency table is exact integers; each
  * entropy/MI term is snapped and folded in DECIMAL; ratios are
  * exact-int doubles.
  *
  * Scale: one broadcast argmax assignment + TWO hash aggregates
  * (contingency, marginals) + bounded folds — linear, no pairs.
  */
object ClusterPurity {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_cluster_purity",
      Some(s"""
        WITH cents AS (
          SELECT vec_id AS centroid, embedding AS cemb
          FROM embeddings WHERE vec_id < 16),
        assigned AS (
          SELECT vec_id, label, centroid FROM (
            SELECT e.vec_id, e.label, c.centroid,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) DESC,
                              c.centroid) AS rn
            FROM embeddings e, cents c)
          WHERE rn = 1),
        ct AS (
          SELECT centroid, label, COUNT(*) AS n
          FROM assigned GROUP BY centroid, label),
        cm AS (SELECT centroid, SUM(n) AS nc FROM ct GROUP BY centroid),
        lm AS (SELECT label, SUM(n) AS nl FROM ct GROUP BY label),
        tot AS (SELECT SUM(n) AS nt FROM ct),
        best AS (
          SELECT centroid, label AS maj_label, n AS maj_n FROM (
            SELECT centroid, label, n,
                   ROW_NUMBER() OVER (PARTITION BY centroid
                                      ORDER BY n DESC, label) AS rn
            FROM ct) WHERE rn = 1),
        mi AS (
          SELECT CAST(SUM(CAST(${det.sqlSnap9(
          "(ct.n * 1.0 / tot.nt)" +
            " * ln((ct.n * 1.0 / tot.nt) / ((cm.nc * 1.0 / tot.nt) * (lm.nl * 1.0 / tot.nt)))")}
                 AS DECIMAL(28,12))) AS DOUBLE) AS i
          FROM ct JOIN cm USING (centroid) JOIN lm USING (label) CROSS JOIN tot),
        hc AS (
          SELECT CAST(SUM(CAST(${det.sqlSnap9(
          "-(cm.nc * 1.0 / tot.nt) * ln(cm.nc * 1.0 / tot.nt)")}
                 AS DECIMAL(28,12))) AS DOUBLE) AS h
          FROM cm CROSS JOIN tot),
        hl AS (
          SELECT CAST(SUM(CAST(${det.sqlSnap9(
          "-(lm.nl * 1.0 / tot.nt) * ln(lm.nl * 1.0 / tot.nt)")}
                 AS DECIMAL(28,12))) AS DOUBLE) AS h
          FROM lm CROSS JOIN tot)
        SELECT CAST(b.centroid AS BIGINT) AS cluster,
               CAST(c.nc AS BIGINT) AS n,
               CAST(b.maj_label AS BIGINT) AS majority_label,
               b.maj_n * 1.0 / c.nc AS purity,
               CAST(NULL AS DOUBLE) AS nmi
        FROM best b JOIN cm c USING (centroid)
        UNION ALL
        SELECT CAST(999 AS BIGINT), CAST(tot.nt AS BIGINT),
               CAST(-1 AS BIGINT),
               (SELECT SUM(maj_n) FROM best) * 1.0 / tot.nt,
               ${det.sqlSnap9("2.0 * mi.i / (hc.h + hl.h)")}
        FROM tot CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl
        ORDER BY cluster
      """.trim),
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        val emb = embeddings(s, d)
        val cents = broadcast(emb.filter($"vec_id" < 16)
          .select($"vec_id".as("centroid"), $"embedding".as("cemb")))
        val w = Window.partitionBy($"vec_id")
          .orderBy($"ccos".desc, $"centroid".asc)
        val assigned = emb.crossJoin(cents)
          .select($"vec_id", $"label", $"centroid",
            Similarity.cosineNative($"embedding", $"cemb").as("ccos"))
          .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        val ct = assigned.groupBy($"centroid", $"label")
          .agg(count(lit(1)).as("n"))
        val cm = ct.groupBy($"centroid").agg(sum($"n").as("nc"))
        val lm = ct.groupBy($"label".as("l_lab")).agg(sum($"n").as("nl"))
        val tot = ct.agg(sum($"n").as("nt"))
        val bw = Window.partitionBy($"centroid").orderBy($"n".desc, $"label")
        val best = ct.withColumn("rn", row_number().over(bw))
          .filter($"rn" === 1)
          .select($"centroid", $"label".as("maj_label"), $"n".as("maj_n"))
        val mi = ct.join(cm, "centroid")
          .join(lm, $"label" === $"l_lab")
          .crossJoin(broadcast(tot))
          .agg(sum(det.snap9(($"n" * lit(1.0) / $"nt")
            * log(($"n" * lit(1.0) / $"nt")
              / (($"nc" * lit(1.0) / $"nt") * ($"nl" * lit(1.0) / $"nt"))))
            .cast(DecimalType(28, 12))).cast("double").as("i"))
        val hc = cm.crossJoin(broadcast(tot))
          .agg(sum(det.snap9(-($"nc" * lit(1.0) / $"nt")
            * log($"nc" * lit(1.0) / $"nt"))
            .cast(DecimalType(28, 12))).cast("double").as("hc"))
        val hl = lm.crossJoin(broadcast(tot))
          .agg(sum(det.snap9(-($"nl" * lit(1.0) / $"nt")
            * log($"nl" * lit(1.0) / $"nt"))
            .cast(DecimalType(28, 12))).cast("double").as("hl"))
        val per = best.join(cm, "centroid")
          .select($"centroid".cast("long").as("cluster"),
            $"nc".cast("long").as("n"),
            $"maj_label".cast("long").as("majority_label"),
            ($"maj_n" * lit(1.0) / $"nc").as("purity"),
            lit(null).cast("double").as("nmi"))
        val sumMaj = best.agg(sum($"maj_n").as("sm"))
        val overall = tot.crossJoin(mi).crossJoin(hc).crossJoin(hl)
          .crossJoin(sumMaj)
          .select(lit(999L).as("cluster"), $"nt".cast("long").as("n"),
            lit(-1L).as("majority_label"),
            ($"sm" * lit(1.0) / $"nt").as("purity"),
            det.snap9(lit(2.0) * $"i" / ($"hc" + $"hl")).as("nmi"))
        per.unionByName(overall).orderBy($"cluster")
      }))
}
