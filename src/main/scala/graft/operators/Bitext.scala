package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-pair mining (Artetxe & Schwenk, "Margin-based
  * Parallel Corpus Mining", ACL'19 — the CCMatrix/LASER recipe): in a
  * shared embedding space, a candidate pair (x, y) across two corpora
  * is a mined pair when its cosine stands OUT relative to each side's
  * neighborhood — absolute-threshold mining drifts with hubness, the
  * margin criterion does not. Here the two "languages" are the even /
  * odd label halves of the embedding corpus (the harness analogue of an
  * en/de split).
  *
  * margin(x, y) = cos(x, y) / ((meanK(x) + meanK(y)) / 2), where
  * meanK(s) is the mean cosine of s's top-K cross-side candidates.
  *
  * Scale + determinism disciplines:
  *   - candidates are IVF-bucket restricted (same centroids CTE as
  *     `sim_dbscan`) — never |A|×|B|; the bucket relation is mirrored
  *     in the oracle so both engines compare the identical relation;
  *   - ALL margin arithmetic happens in 1e-9-scaled INTEGER space
  *     (icos = round(cos·1e9)): top-K selection, the mean-of-means
  *     denominator and the ×1.05 threshold are exact BIGINT
  *     comparisons, immune to float summation order across engines.
  *     The reported margin is one division of exactly-representable
  *     integers (each < 2^53), bit-identical in both engines.
  *
  * Two twins over the identical margin body (r11 verdict #1 — the
  * fixed-K row was the suite's one measured above-linear sf1 exponent,
  * 1.13, traced to (n/K)² bucket occupancy):
  *   - `sim_margin_bitext` keeps K = 16 centroids at every scale — the
  *     fixture's growth mode, kept so the hazard stays measured;
  *   - `sim_margin_bitext_adaptive` derives K = max(16, n DIV 128)
  *     from the corpus ([[Similarity.ivfAssignTopAdaptive]]): identical
  *     results at every driver scale (all fixtures resolve to K = 16),
  *     but bucket OCCUPANCY stays ~128 as n grows, so in-bucket pair
  *     work — and the margin stage that rides on it — scales linearly.
  */
object Bitext {

  private val TOPK = 4
  private val MARGIN_X100 = 105 // mine when margin > 1.05

  /** The margin-mining SQL body over any CTE that ends in an
    * `assigned(vec_id, centroid, …)` relation. */
  private def marginSql(assignedCte: String): String = s"""
    WITH RECURSIVE $assignedCte,
    sideA AS (SELECT vec_id, embedding FROM embeddings WHERE label % 2 = 0),
    sideB AS (SELECT vec_id, embedding FROM embeddings WHERE label % 2 = 1),
    cand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM assigned x JOIN assigned y ON x.centroid = y.centroid
      JOIN sideA sa ON sa.vec_id = x.vec_id
      JOIN sideB sb ON sb.vec_id = y.vec_id),
    scored AS (
      SELECT c.a, c.b,
             CAST(round(list_cosine_similarity(
               sa.embedding::DOUBLE[], sb.embedding::DOUBLE[]) * 1e9)
               AS BIGINT) AS icos
      FROM cand c
      JOIN sideA sa ON sa.vec_id = c.a
      JOIN sideB sb ON sb.vec_id = c.b),
    ranked AS (
      SELECT a, b, icos,
             ROW_NUMBER() OVER (PARTITION BY a ORDER BY icos DESC, b) AS ra,
             ROW_NUMBER() OVER (PARTITION BY b ORDER BY icos DESC, a) AS rb
      FROM scored),
    da AS (
      SELECT a, CAST(SUM(icos) AS BIGINT) AS dsum, COUNT(*) AS dn
      FROM ranked WHERE ra <= $TOPK GROUP BY a),
    db AS (
      SELECT b, CAST(SUM(icos) AS BIGINT) AS dsum, COUNT(*) AS dn
      FROM ranked WHERE rb <= $TOPK GROUP BY b),
    mined AS (
      SELECT s.a, s.b, s.icos,
             CAST(s.icos * 2 * da.dn * db.dn AS DOUBLE)
               / (da.dsum * db.dn + db.dsum * da.dn) AS margin
      FROM scored s
      JOIN da ON da.a = s.a
      JOIN db ON db.b = s.b
      WHERE s.icos > 0
        AND s.icos * 2 * da.dn * db.dn * 100
            > $MARGIN_X100 * (da.dsum * db.dn + db.dsum * da.dn))
    SELECT a, b, icos, margin FROM mined
    ORDER BY a, b
  """.trim

  /** The margin-mining plan over any `assigned(vec_id, centroid)`
    * bucket relation. Callers pass the corpus and a pre-persisted
    * assignment so both twins share one body. */
  private def marginPlan(emb: DataFrame, assigned: DataFrame): DataFrame = {
    val sideA = emb.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("a"), col("embedding").as("ea"))
    val sideB = emb.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("b"), col("embedding").as("eb"))
    val cand = assigned.select(col("vec_id").as("a"), col("centroid"))
      .join(assigned.select(col("vec_id").as("b"), col("centroid")), Seq("centroid"))
      .join(sideA.select(col("a")), Seq("a"), "left_semi")
      .join(sideB.select(col("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b")).distinct()
    val scored = cand
      .join(sideA, "a").join(sideB, "b")
      .select(col("a"), col("b"),
        round(Similarity.cosineNative(col("ea"), col("eb")) * 1e9)
          .cast("long").as("icos"))
    val ranked = scored
      .withColumn("ra", row_number().over(
        Window.partitionBy(col("a")).orderBy(col("icos").desc, col("b"))))
      .withColumn("rb", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("icos").desc, col("a"))))
    val da = ranked.filter(col("ra") <= TOPK).groupBy(col("a"))
      .agg(sum(col("icos")).as("dsa"), count(lit(1)).as("dna"))
    val db = ranked.filter(col("rb") <= TOPK).groupBy(col("b"))
      .agg(sum(col("icos")).as("dsb"), count(lit(1)).as("dnb"))
    scored.join(da, "a").join(db, "b")
      .filter(col("icos") > 0 &&
        col("icos") * 2 * col("dna") * col("dnb") * 100 >
          lit(MARGIN_X100) * (col("dsa") * col("dnb") + col("dsb") * col("dna")))
      .select(col("a"), col("b"), col("icos"),
        ((col("icos") * 2 * col("dna") * col("dnb")).cast("double")
          / (col("dsa") * col("dnb") + col("dsb") * col("dna")))
          .as("margin"))
      .orderBy(col("a"), col("b"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sim_margin_bitext",
      Some(marginSql(Similarity.sqlIvfAssignedCte(16, 3))),
      (s, d) => {
        val emb = embeddings(s, d)
        val assigned = Similarity.ivfAssignTop(emb, 16, 3)
          .select(col("vec_id"), col("centroid")).persist()
        marginPlan(emb, assigned)
      }),
    QueryDef(
      "sim_margin_bitext_adaptive",
      Some(marginSql(Similarity.sqlIvfAssignedCteAdaptive(16, 128, 3))),
      (s, d) => {
        val emb = embeddings(s, d)
        val assigned = Similarity.ivfAssignTopAdaptive(emb, 16, 128, 3)
          .select(col("vec_id"), col("centroid")).persist()
        marginPlan(emb, assigned)
      }))
}
