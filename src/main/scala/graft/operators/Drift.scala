package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Embedding-space drift monitoring: the label-centroid similarity
  * matrix. A training-data pipeline reads this per ingestion batch:
  * two sources whose centroids drift together are collapsing into one
  * domain (their mixture weights double-count), and a source drifting
  * away from its own history is changing distribution.
  *
  * Portability: per-dim means of raw floats are NOT cross-engine
  * hash-stable — float→DECIMAL casts disagree at the last unit
  * (measured: 25/64 dims of this corpus's mean off by one float ulp
  * between Spark and DuckDB), which is why the k-means oracles compare
  * ranks, never raw centroids. Here each component is integerized
  * first as floor(v · 10⁶): a float's mantissa (24 bits) times 10⁶
  * (20 bits) is ≤ 44 bits, so the double product is EXACT in both
  * engines and the quantized sums are plain integer arithmetic. The
  * mean is then two fixed-order double divisions, rounded to float,
  * and the pair score is one native cosine over identical bits.
  *
  * Scale: one corpus scan, a (labels × dim)-row aggregate, then a
  * labels²/2 broadcast pair join over model-sized tables.
  */
object Drift {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sim_centroid_drift",
      Some("""
        WITH ex AS (
          SELECT label, vec_id, t.d,
                 -- CAST, not a 1000000.0 literal: DuckDB types that
                 -- literal DECIMAL(8,1) and REAL*DECIMAL runs in FLOAT,
                 -- destroying the exact 44-bit product
                 CAST(floor(embedding[t.d + 1] * CAST(1000000 AS DOUBLE)) AS BIGINT) AS qv
          FROM embeddings, range(0, 64) t(d)),
        lc AS (
          SELECT label, list(vr ORDER BY d) AS lemb, MAX(nv) AS n_vecs FROM (
            SELECT label, d,
                   CAST(CAST(SUM(qv) AS DOUBLE) / COUNT(*) / CAST(1000000 AS DOUBLE) AS REAL) AS vr,
                   COUNT(*) AS nv
            FROM ex GROUP BY label, d)
          GROUP BY label)
        SELECT CAST(a.label AS BIGINT) AS label_a,
               CAST(b.label AS BIGINT) AS label_b,
               CAST(a.n_vecs AS BIGINT) AS n_a,
               CAST(b.n_vecs AS BIGINT) AS n_b,
               list_cosine_similarity(a.lemb::DOUBLE[], b.lemb::DOUBLE[]) AS cos_ab
        FROM lc a JOIN lc b ON a.label < b.label
        ORDER BY label_a, label_b
      """.trim),
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val ex = embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
          .select(col("label"), col("d"),
            floor(col("v") * 1000000.0).cast("long").as("qv"))
        val byDim = ex.groupBy(col("label"), col("d"))
          .agg((sum(col("qv")).cast("double") / count(lit(1)) / 1000000.0)
            .cast("float").as("vr"),
            count(lit(1)).as("nv"))
        val lc = byDim.groupBy(col("label"))
          .agg(transform(array_sort(collect_list(struct(col("d"), col("vr")))),
            x => x.getField("vr")).as("lemb"),
            max(col("nv")).as("n_vecs"))
        val a = lc.select(col("label").as("la"), col("lemb").as("ea"), col("n_vecs").as("n_a"))
        val b = lc.select(col("label").as("lb"), col("lemb").as("eb"), col("n_vecs").as("n_b"))
        a.join(broadcast(b), col("la") < col("lb"))
          .select(col("la").cast("long").as("label_a"),
            col("lb").cast("long").as("label_b"),
            col("n_a").cast("long").as("n_a"),
            col("n_b").cast("long").as("n_b"),
            Similarity.cosineNative(col("ea"), col("eb")).as("cos_ab"))
          .orderBy(col("label_a"), col("label_b"))
      }))
}
