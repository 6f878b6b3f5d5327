package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Simplified silhouette (Hruschka et al. 2004) of the trained IVF
  * k-means clustering — cluster-quality validation that replaces the
  * classic silhouette's O(n²) pairwise distances with distances to
  * CENTROIDS: a = d(x, own centroid), b = min d(x, other centroid),
  * s = (b−a)/max(a,b). On cosine distance d = 1−cos this reduces to
  * s = (c₁−c₂)/(1−c₂) where c₁ ≥ c₂ are the point's two highest
  * centroid similarities. Per cluster: size and mean silhouette;
  * row 999 is the corpus mean — the number you trend to catch a
  * degrading embedding space.
  *
  * Centroids are the deterministic IVF-flat baseline (first-k corpus
  * vectors, the ivfAssignments default) rather than trained k-means:
  * the two engines' k-means reproduce each other only to ~1e-8 in the
  * centroid floats (fine for argmax assignment, which is what the ANN
  * queries pin; fatal for a statistic that EMITS centroid cosines),
  * while corpus vectors are bit-identical parquet floats. The
  * silhouette of the coarse quantizer is also the operationally
  * interesting number — it scores the partition the IVF index
  * actually probes.
  *
  * Determinism: per-point s is snapped and the cluster means
  * accumulate in DECIMAL(28,12); the final mean is an exact-decimal /
  * count division, bit-identical unsnapped.
  *
  * Scale: the whole statistic is ONE broadcast of k·dim floats + a
  * per-point top-2 over k centroid similarities (keyed window, k rows
  * per key) + a hash aggregate — linear where the textbook silhouette
  * is quadratic. That reduction is exactly why this is the variant
  * that survives 100 TB.
  */
object Silhouette {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_silhouette",
      Some(s"""
        WITH cents AS (
          SELECT vec_id AS centroid, embedding AS cemb
          FROM embeddings WHERE vec_id < 16),
        sc AS (
          SELECT e.vec_id, c.centroid,
                 list_cosine_similarity(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) AS ccos,
                 ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) DESC,
                            c.centroid) AS rn
          FROM embeddings e, cents c),
        top2 AS (
          SELECT vec_id,
                 MAX(CASE WHEN rn = 1 THEN centroid END) AS cluster,
                 MAX(CASE WHEN rn = 1 THEN ccos END) AS c1,
                 MAX(CASE WHEN rn = 2 THEN ccos END) AS c2
          FROM sc WHERE rn <= 2 GROUP BY vec_id),
        sil AS (
          SELECT cluster,
                 CAST(${det.sqlSnap9(
          "(c1 - c2) / NULLIF(1 - c2, 0)")} AS DECIMAL(28,12)) AS s
          FROM top2)
        SELECT CAST(cluster AS BIGINT) AS cluster,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_sil
        FROM sil GROUP BY cluster
        UNION ALL
        SELECT CAST(999 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(SUM(s) AS DOUBLE) / COUNT(*)
        FROM sil
        ORDER BY cluster
      """.trim),
      (s, d) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        val emb = embeddings(s, d)
        val cents = broadcast(emb.filter($"vec_id" < 16)
          .select($"vec_id".as("centroid"), $"embedding".as("cemb")))
        val sc = emb.crossJoin(cents)
          .select($"vec_id", $"centroid",
            Similarity.cosineNative($"embedding", $"cemb").as("ccos"))
        val w = Window.partitionBy($"vec_id")
          .orderBy($"ccos".desc, $"centroid".asc)
        val top2 = sc.withColumn("rn", row_number().over(w))
          .filter($"rn" <= 2)
          .groupBy($"vec_id")
          .agg(max(when($"rn" === 1, $"centroid")).as("cluster"),
            max(when($"rn" === 1, $"ccos")).as("c1"),
            max(when($"rn" === 2, $"ccos")).as("c2"))
        val sil = top2.select($"cluster",
          det.snap9(($"c1" - $"c2") / nullif(lit(1) - $"c2", lit(0)))
            .cast(DecimalType(28, 12)).as("s"))
        val per = sil.groupBy($"cluster")
          .agg(count(lit(1)).as("n"),
            (sum($"s").cast("double") / count(lit(1))).as("mean_sil"))
          .select($"cluster".cast("long").as("cluster"),
            $"n".cast("long").as("n"), $"mean_sil")
        val overall = sil.agg(lit(999L).as("cluster"),
            count(lit(1)).cast("long").as("n"),
            (sum($"s").cast("double") / count(lit(1))).as("mean_sil"))
          .select($"cluster", $"n", $"mean_sil")
        per.unionByName(overall).orderBy($"cluster")
      }))
}
