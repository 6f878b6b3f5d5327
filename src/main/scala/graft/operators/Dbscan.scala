package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density clustering (DBSCAN, Ester et al. KDD'96) over the
  * embedding corpus — the curation view that separates dense semantic
  * regions (template families, boilerplate clusters) from genuine
  * long-tail content before sampling decisions.
  *
  * The ε-neighbor relation is cosine ≥ 0.3 restricted to IVF-bucket
  * candidates ([[Similarity.ivfNearDupPairs]]) — the same
  * candidates-then-verify discipline as the near-dup family: NO n²
  * operator anywhere; the oracle mirrors the identical bucket
  * construction so the compared relation is exactly the same on both
  * engines (recall vs the unbucketed relation is priced separately by
  * `dd_embedding_neardup_recall`). On top of that relation the
  * classification is textbook: core = degree ≥ minPts, clusters =
  * connected components of the core-core subgraph (alternating-star
  * min-label fixpoint), border = non-core with a core neighbor
  * (assigned the MINIMUM neighboring cluster rep — deterministic,
  * unlike scan-order DBSCAN), noise = the rest.
  *
  * Every stage is a key-partitioned shuffle: degree groupBy, two
  * semi-joins onto the core set, the CC fixpoint, one min-agg for
  * borders. At 100 TB the candidate volume is the only knob, and it
  * belongs to the IVF layer — HERE nCentroids is a compile-time 16
  * (the oracle mirrors the literal), so bucket occupancy grows with n;
  * the data-adaptive formulation that holds occupancy constant is
  * [[Similarity.ivfAssignTopAdaptive]], measured by
  * `sim_margin_bitext_adaptive` (r11 verdict #1).
  */
object Dbscan {

  private val minCos = 0.3
  private val minPts = 4

  private[graft] def classify(emb: DataFrame): DataFrame = {
    val pairs = Similarity.ivfNearDupPairs(emb, nCentroids = 16,
        nAssign = 3, minCos = minCos)
      .select(col("i"), col("j"))
    val sym = pairs.select(col("i").as("u"), col("j").as("v"))
      .union(pairs.select(col("j").as("u"), col("i").as("v")))
      .localCheckpoint()
    val core = sym.groupBy(col("u")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minPts)
      .select(col("u"))
    val coreEdges = sym
      .join(core, Seq("u"), "left_semi")
      .join(core.select(col("u").as("v")), Seq("v"), "left_semi")
      .select(col("u"), col("v"))
    val ccl = Dedup.ccLabels(coreEdges)
      .select(col("u"), col("v").as("mn"))
    val coreRep = core
      .join(ccl, Seq("u"), "left")
      .select(col("u").as("vec_id"),
        coalesce(col("mn"), col("u")).as("core_rep"))
    val borderRep = sym
      .join(core, Seq("u"), "left_anti")
      .join(coreRep.select(col("vec_id").as("v"), col("core_rep")), Seq("v"))
      .groupBy(col("u"))
      .agg(min(col("core_rep")).as("border_rep"))
      .select(col("u").as("vec_id"), col("border_rep"))
    emb.select(col("vec_id"))
      .join(coreRep, Seq("vec_id"), "left")
      .join(borderRep, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("core_rep").isNotNull, "core")
          .when(col("border_rep").isNotNull, "border")
          .otherwise("noise").as("point_type"),
        coalesce(col("core_rep"), col("border_rep"), lit(-1L))
          .as("cluster"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_dbscan",
      Some(s"""
        WITH RECURSIVE ${Similarity.sqlIvfAssignedCte(16, 3)},
        cand AS (
          SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
          FROM assigned a JOIN assigned b
            ON a.centroid = b.centroid AND a.vec_id < b.vec_id),
        verified AS (
          SELECT c.i, c.j
          FROM cand c
          JOIN embeddings x ON x.vec_id = c.i
          JOIN embeddings y ON y.vec_id = c.j
          WHERE list_cosine_similarity(
                  x.embedding::DOUBLE[], y.embedding::DOUBLE[]) >= $minCos),
        sym AS (SELECT i AS u, j AS v FROM verified
                UNION ALL SELECT j, i FROM verified),
        core AS (SELECT u FROM (SELECT u, COUNT(*) AS nd FROM sym GROUP BY u)
                 WHERE nd >= $minPts),
        cedges AS (
          SELECT s.u, s.v FROM sym s
          JOIN core a ON s.u = a.u JOIN core b ON s.v = b.u),
        walk(u, v) AS (
          SELECT u, v FROM cedges
          UNION
          SELECT w.u, e.v FROM walk w JOIN cedges e ON w.v = e.u),
        mins AS (SELECT u, MIN(v) AS mn FROM walk GROUP BY u),
        corerep AS (
          SELECT c.u AS vec_id, COALESCE(LEAST(c.u, m.mn), c.u) AS rep
          FROM core c LEFT JOIN mins m ON c.u = m.u),
        borderrep AS (
          SELECT s.u AS vec_id, MIN(r.rep) AS rep
          FROM sym s
          JOIN corerep r ON s.v = r.vec_id
          WHERE s.u NOT IN (SELECT u FROM core)
          GROUP BY s.u)
        SELECT e.vec_id,
               CASE WHEN c.rep IS NOT NULL THEN 'core'
                    WHEN b.rep IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS point_type,
               COALESCE(c.rep, b.rep, -1) AS cluster
        FROM embeddings e
        LEFT JOIN corerep c ON e.vec_id = c.vec_id
        LEFT JOIN borderrep b ON e.vec_id = b.vec_id
        ORDER BY e.vec_id
      """.trim),
      (s, d) => classify(embeddings(s, d)).orderBy(col("vec_id"))))
}
