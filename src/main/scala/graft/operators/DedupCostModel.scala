package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.functions.TextFunctions._
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dedup blocking-strategy cost model — the planning query you run
  * BEFORE a 100 TB dedup job: for each candidate blocking scheme
  * (exact text hash; first-64-char prefix hash; length bucket;
  * first-8-char shingle key), measure from the actual key
  * distribution what the verify stage would pay — candidate pairs
  * Σ C(bucket, 2), the largest bucket (the straggler partition), and
  * the reduction ratio vs all-pairs. Costs come from bucket SIZES
  * only: the model never materializes a single candidate pair, so the
  * audit is linear even for catastrophic schemes — the same
  * discipline as er_blocking_quality, applied to strategy selection.
  *
  * Determinism: keys are exact strings/integers and the portable MD5
  * hash; all counts integer; ratios exact-int doubles, snapped.
  *
  * Scale: one projection + ONE (scheme, key) hash aggregate over the
  * 4× unioned keying (map-side combined), then scheme-level folds.
  */
object DedupCostModel {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dd_cost_model", {
        val clean = sqlClean("text")
        val h = PortableHash.sqlH32(clean)
        val hPfx = PortableHash.sqlH32(s"substr($clean, 1, 64)")
        val hSh = PortableHash.sqlH32(s"substr($clean, 1, 8)")
        Some(s"""
        WITH keyed AS (
          SELECT 'exact_hash' AS scheme, CAST($h AS VARCHAR) AS k FROM documents
          UNION ALL
          SELECT 'prefix64_hash', CAST($hPfx AS VARCHAR) FROM documents
          UNION ALL
          SELECT 'length_bucket', CAST(length($clean) // 50 AS VARCHAR) FROM documents
          UNION ALL
          SELECT 'shingle8_key', CAST($hSh AS VARCHAR) FROM documents),
        buckets AS (
          SELECT scheme, k, COUNT(*) AS n FROM keyed GROUP BY scheme, k),
        tot AS (SELECT COUNT(*) AS nd FROM documents),
        cost AS (
          SELECT scheme, COUNT(*) AS n_buckets,
                 SUM(n * (n - 1) // 2) AS cand_pairs,
                 MAX(n) AS max_bucket
          FROM buckets GROUP BY scheme)
        SELECT c.scheme,
               CAST(c.n_buckets AS BIGINT) AS n_buckets,
               CAST(c.cand_pairs AS BIGINT) AS cand_pairs,
               CAST(c.max_bucket AS BIGINT) AS max_bucket,
               ${det.sqlSnap9(
          "1.0 - c.cand_pairs * 1.0 / (t.nd * (t.nd - 1) / 2)")} AS reduction_ratio
        FROM cost c CROSS JOIN tot t
        ORDER BY c.scheme
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d)
        val withClean = docs.select(cleanText($"text").as("ct"))
        def scheme(name: String, key: Column): DataFrame =
          withClean.select(lit(name).as("scheme"), key.cast("string").as("k"))
        val keyed = scheme("exact_hash", PortableHash.h32($"ct"))
          .unionByName(scheme("prefix64_hash",
            PortableHash.h32(substring($"ct", 1, 64))))
          .unionByName(scheme("length_bucket", expr("length(ct) div 50")))
          .unionByName(scheme("shingle8_key",
            PortableHash.h32(substring($"ct", 1, 8))))
        val buckets = keyed.groupBy($"scheme", $"k")
          .agg(count(lit(1)).as("n"))
        val tot = docs.agg(count(lit(1)).as("nd"))
        val cost = buckets.groupBy($"scheme")
          .agg(count(lit(1)).as("n_buckets"),
            sum(expr("n * (n - 1) div 2")).as("cand_pairs"),
            max($"n").as("max_bucket"))
        cost.crossJoin(broadcast(tot))
          .select($"scheme",
            $"n_buckets".cast("long").as("n_buckets"),
            $"cand_pairs".cast("long").as("cand_pairs"),
            $"max_bucket".cast("long").as("max_bucket"),
            det.snap9(lit(1.0) - $"cand_pairs" * lit(1.0)
              / ($"nd" * ($"nd" - 1) / 2)).as("reduction_ratio"))
          .orderBy($"scheme")
      }))
}
