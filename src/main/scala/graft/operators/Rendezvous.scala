package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding plan (Thaler &
  * Ravishankar, IEEE ToN 1998) — the consistent-assignment scheme
  * behind cache rings and shard routers: each document goes to the
  * shard with the highest hash(doc, shard). The query reports the
  * 16-shard load profile AND the migration cost of growing to 17
  * shards: under HRW exactly the documents whose argmax becomes the
  * new shard move (expected 1/17 of the corpus) — the property that
  * makes resharding cheap, versus mod-N hashing where nearly
  * everything moves. Both the balance and the measured migration
  * share are oracle-checked.
  *
  * Determinism: weights are the portable MD5 hash; argmax ties break
  * on the smaller shard id.
  *
  * Scale: a |docs|×|shards| expression fan-out (17 hashes per row, no
  * shuffle) + one argmax aggregate per doc + shard-level counts —
  * linear with map-side combine, no state.
  */
object Rendezvous {

  private val n1 = 16
  private val n2 = 17

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_rendezvous_shards", {
        val h = PortableHash.sqlH32("doc_id || '#' || s.shard")
        Some(s"""
        WITH sh AS (SELECT UNNEST(range(0, $n2)) AS shard),
        wt AS (
          SELECT d.doc_id, s.shard, $h AS w
          FROM documents d CROSS JOIN sh s),
        pick AS (
          SELECT doc_id,
                 MAX(CASE WHEN rn1 = 1 THEN shard END) AS shard16,
                 MAX(CASE WHEN rn2 = 1 THEN shard END) AS shard17
          FROM (
            SELECT doc_id, shard,
                   CASE WHEN shard < $n1 THEN
                     ROW_NUMBER() OVER (PARTITION BY doc_id,
                       CASE WHEN shard < $n1 THEN 0 ELSE 1 END
                       ORDER BY w DESC, shard) END AS rn1,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY w DESC, shard) AS rn2
            FROM wt)
          GROUP BY doc_id),
        tot AS (SELECT COUNT(*) AS n,
                       SUM(CASE WHEN shard16 <> shard17 THEN 1 ELSE 0 END) AS moved
                FROM pick)
        SELECT CAST(p.shard16 AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN p.shard16 <> p.shard17 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_moving,
               ${det.sqlSnap9("MAX(t.moved) * 1.0 / MAX(t.n)")} AS global_move_share
        FROM pick p CROSS JOIN tot t
        GROUP BY p.shard16
        ORDER BY shard
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val sh = s.range(0, n2).select($"id".cast("int").as("shard"))
        val wt = documents(s, d).select($"doc_id")
          .crossJoin(broadcast(sh))
          .select($"doc_id", $"shard",
            PortableHash.h32(concat($"doc_id", lit("#"), $"shard")).as("w"))
        val pick = wt.groupBy($"doc_id")
          .agg(
            max_by($"shard", when($"shard" < n1,
              struct($"w", (-$"shard").as("ns")))).as("shard16"),
            max_by($"shard", struct($"w", (-$"shard").as("ns"))).as("shard17"))
        val tot = pick.agg(count(lit(1)).as("n"),
          sum(when($"shard16" =!= $"shard17", 1L).otherwise(0L)).as("moved"))
        pick.crossJoin(broadcast(tot))
          .groupBy($"shard16")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(when($"shard16" =!= $"shard17", 1L).otherwise(0L))
              .cast("long").as("n_moving"),
            det.snap9(max($"moved") * lit(1.0) / max($"n"))
              .as("global_move_share"))
          .select($"shard16".cast("long").as("shard"), $"n_docs",
            $"n_moving", $"global_move_share")
          .orderBy($"shard")
      }))
}
