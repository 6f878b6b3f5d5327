package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Blocking-key selection sweep (Bilenko et al., "Adaptive blocking",
  * ICDM 2006; Christen 2012 §7): score SIX candidate blocking schemes
  * against the exact edit-1 truth relation in one pass — pair
  * completeness (truth recall inside blocks) and reduction ratio
  * (candidate volume vs all pairs) per scheme. `er_blocking_quality`
  * audits ONE committed scheme; this is the sweep you run FIRST, and
  * at 100 TB it is the difference between a blocking key that feeds a
  * tractable candidate join and one that silently drops half the true
  * matches (short prefixes here: perfect recall, useless reduction;
  * the attribute key: massive reduction, catastrophic recall — the
  * sweep makes the tradeoff a table instead of a belief).
  *
  * Scale: candidate counts come from Σ n·(n−1)/2 over per-(scheme,key)
  * block sizes — candidates are NEVER materialized, so auditing a bad
  * scheme is as cheap as a good one; the truth relation is the FastSS
  * deletion-neighborhood join (linear, built once and checkpointed);
  * schemes ride ONE melted explode, so the sweep is one groupBy + one
  * truth join regardless of how many schemes it scores.
  */
object BlockingSweep {

  /** (scheme name, DuckDB key expression, Spark key column). The suffix
    * scheme keys on the LAST 6 chars — names shorter than 6 key on the
    * whole string in both engines. */
  private def schemes: Seq[(String, String, org.apache.spark.sql.Column)] = Seq(
    ("prefix4", "substr(c_name, 1, 4)", substring(col("c_name"), 1, 4)),
    ("prefix8", "substr(c_name, 1, 8)", substring(col("c_name"), 1, 8)),
    ("prefix12", "substr(c_name, 1, 12)", substring(col("c_name"), 1, 12)),
    ("prefix16", "substr(c_name, 1, 16)", substring(col("c_name"), 1, 16)),
    ("suffix6",
      "substr(c_name, greatest(1, len(c_name) - 5))",
      expr("substr(c_name, greatest(1, length(c_name) - 5))")),
    ("attrs",
      "CAST(c_nationkey AS VARCHAR) || '~' || c_mktsegment",
      concat(col("c_nationkey").cast("string"), lit("~"), col("c_mktsegment"))))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "er_blocking_sweep",
      Some(s"""
        WITH ${EntityRes.sqlPairs},
        blk AS (${schemes.map { case (n, sqlK, _) =>
          s"SELECT c_custkey, '$n' AS scheme, $sqlK AS k FROM customer" }
          .mkString(" UNION ALL ")}),
        bsz AS (SELECT scheme, k, COUNT(*) AS n FROM blk GROUP BY 1, 2),
        cand AS (
          SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_blocks,
                 CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS n_cand
          FROM bsz GROUP BY scheme),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM customer),
        tstat AS (
          SELECT xa.scheme,
                 CAST(COUNT(*) AS BIGINT) AS n_true,
                 CAST(SUM(CASE WHEN xa.k = xb.k THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_found
          FROM pairs p
          JOIN blk xa ON xa.c_custkey = p.a
          JOIN blk xb ON xb.c_custkey = p.b AND xb.scheme = xa.scheme
          GROUP BY xa.scheme)
        SELECT c.scheme, c.n_blocks, c.n_cand, t.n_true, t.n_found,
               ${det.sqlSnap9("t.n_found * 1.0 / t.n_true")} AS pair_completeness,
               ${det.sqlSnap9(
        "1.0 - c.n_cand * 1.0 / (o.n * (o.n - 1) / 2)")} AS reduction_ratio
        FROM cand c JOIN tstat t ON c.scheme = t.scheme, tot o
        ORDER BY c.scheme
      """.trim),
      (s, d) => {
        val cust = customer(s, d)
        val blk = balanced(cust).select(col("c_custkey"),
            explode(array(schemes.map { case (n, _, k) =>
              struct(lit(n).as("scheme"), k.as("k")) }: _*)).as("sk"))
          .select(col("c_custkey"), col("sk.scheme").as("scheme"),
            col("sk.k").as("k"))
          .localCheckpoint() // feeds block sizing AND both truth joins
        val cand = blk.groupBy(col("scheme"), col("k"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("scheme"))
          .agg(count(lit(1)).as("n_blocks"),
            sum(expr("n * (n - 1) div 2")).as("n_cand"))
        val tot = cust.agg(count(lit(1)).as("n"))
        val tstat = EntityRes.edit1Pairs(cust)
          .join(blk.select(col("c_custkey").as("a"), col("scheme"),
            col("k").as("ka")), Seq("a"))
          .join(blk.select(col("c_custkey").as("b2"),
            col("scheme").as("scheme_b"), col("k").as("kb")),
            col("b") === col("b2") && col("scheme") === col("scheme_b"))
          .groupBy(col("scheme"))
          .agg(count(lit(1)).as("n_true"),
            sum(when(col("ka") === col("kb"), 1L).otherwise(0L)).as("n_found"))
        cand.join(tstat, "scheme").crossJoin(broadcast(tot))
          .select(col("scheme"), col("n_blocks"), col("n_cand"),
            col("n_true"), col("n_found"),
            det.snap9(col("n_found") * 1.0 / col("n_true"))
              .as("pair_completeness"),
            det.snap9(lit(1.0) - col("n_cand") * 1.0
              / (col("n") * (col("n") - 1) / 2)).as("reduction_ratio"))
          .orderBy(col("scheme"))
      }))
}
