package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values / bottom-k theta) distinct-count sketch
  * (Bar-Yossef et al., RANDOM'02; the core of theta sketches): keep
  * the k smallest hash values seen; the estimate is (k−1)/θ with
  * θ = h_(k)/2³² — reported per event type against the exact distinct
  * user count with the realized relative error. Next to sk_hll_merge
  * this is the OTHER industrial distinct sketch — unlike HLL its kept
  * sample supports set operations with provable error, which is why
  * theta sketches won inside warehouses.
  *
  * Determinism: hashes are the portable MD5 h32; the k-th minimum is
  * an exact integer order statistic (rank window keyed by type);
  * both estimates are exact-int arithmetic doubles, snapped.
  *
  * Scale: the sketch is a per-type bottom-k — TakeOrdered-shaped,
  * mergeable (union the candidate sets, re-take k); here one distinct
  * + one ranked window per type over DISTINCT hash values, never the
  * raw stream.
  */
object KmvSketch {

  private val k = 8

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sk_kmv_distinct", {
        val h = PortableHash.sqlH32("CAST(user_id AS VARCHAR)")
        Some(s"""
        WITH hv AS (
          SELECT DISTINCT event_type, $h AS hv FROM events),
        ranked AS (
          SELECT event_type, hv,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
          FROM hv),
        kth AS (
          SELECT event_type, hv AS hk FROM ranked WHERE rn = $k),
        exact AS (
          SELECT event_type, COUNT(DISTINCT user_id) AS nd FROM events
          GROUP BY event_type)
        SELECT e.event_type,
               CAST(e.nd AS BIGINT) AS exact_distinct,
               ${det.sqlSnap9(
          s"($k - 1.0) * 4294967296.0 / kth.hk")} AS kmv_estimate,
               ${det.sqlSnap9(
          s"(($k - 1.0) * 4294967296.0 / kth.hk - e.nd) / e.nd")} AS rel_err
        FROM exact e JOIN kth ON kth.event_type = e.event_type
        ORDER BY e.event_type
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val hv = events(s, d)
          .select($"event_type",
            PortableHash.h32($"user_id".cast("string")).as("hv"))
          .distinct()
        val w = Window.partitionBy($"event_type").orderBy($"hv")
        val kth = hv.withColumn("rn", row_number().over(w))
          .filter($"rn" === k)
          .select($"event_type".as("k_et"), $"hv".as("hk"))
        val exact = events(s, d).groupBy($"event_type")
          .agg(countDistinct($"user_id").as("nd"))
        val est = (lit(k) - 1.0) * 4294967296.0 / $"hk"
        exact.join(kth, $"event_type" === $"k_et")
          .select($"event_type", $"nd".cast("long").as("exact_distinct"),
            det.snap9(est).as("kmv_estimate"),
            det.snap9((est - $"nd") / $"nd").as("rel_err"))
          .orderBy($"event_type")
      }))
}
