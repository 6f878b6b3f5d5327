package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Shard-local dedup recall audit — THE practical question of dedup at
  * 100 TB: global near-dup joins are expensive, so production pipelines
  * often dedup within hash shards only (each shard fits a worker pool)
  * and eat the cross-shard misses. This query measures exactly what
  * that buys and costs: for shard counts {4, 16, 64}, the fraction of
  * true near-dup pairs (the `dd_minhash_lsh` truth relation, Jaccard ≥
  * 0.7) that land in the SAME shard — i.e. the recall of shard-local
  * dedup — under a content-blind hash partitioning. Random sharding
  * puts a pair together with probability 1/k, so recall collapsing
  * toward 1/k is the expected verdict, and the table is the evidence
  * for why near-dup sharding must be SIGNATURE-driven (LSH-bucket
  * rendezvous, as `dd_minhash_lsh`'s banded join does) rather than
  * id-hash-driven.
  *
  * Determinism: shard ids are the portable md5 hash of the doc id;
  * counts are integers; recall is one snapped ratio. Scale: the truth
  * relation is built once (banded candidates + distributed verify) and
  * checkpointed; the sweep is a 3-row broadcast cross join over the
  * (small) pair set.
  */
object ShardLocalDedup {

  private val SHARD_COUNTS = Seq(4, 16, 64)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dd_shard_local_recall",
      Some(s"""
        WITH ${Dedup.sqlLshPairsCtes()},
        ks AS (${SHARD_COUNTS.map(k => s"SELECT $k AS k").mkString(" UNION ALL ")}),
        scored AS (
          SELECT ks.k,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(CASE WHEN
                     ${PortableHash.sqlH32("CAST(p.i AS VARCHAR)")} % ks.k
                       = ${PortableHash.sqlH32("CAST(p.j AS VARCHAR)")} % ks.k
                   THEN 1 ELSE 0 END) AS BIGINT) AS within_pairs
          FROM pairs p CROSS JOIN ks
          GROUP BY ks.k)
        SELECT CAST(k AS BIGINT) AS n_shards, n_pairs, within_pairs,
               n_pairs - within_pairs AS missed_pairs,
               ${det.sqlSnap9("within_pairs * 1.0 / n_pairs")} AS recall
        FROM scored
        ORDER BY n_shards
      """.trim),
      (s, d) => {
        import s.implicits._
        val pairs = Dedup.minhashLshPairs(documents(s, d))
          .select(col("i"), col("j"))
          .localCheckpoint() // one truth build for the 3-way sweep
        val ks = SHARD_COUNTS.toDF("k")
        def shard(c: org.apache.spark.sql.Column) =
          PortableHash.h32(c.cast("string")) % col("k")
        pairs.crossJoin(broadcast(ks))
          .groupBy(col("k"))
          .agg(count(lit(1)).cast("long").as("n_pairs"),
            sum(when(shard(col("i")) === shard(col("j")), 1L).otherwise(0L))
              .cast("long").as("within_pairs"))
          .select(col("k").cast("long").as("n_shards"), col("n_pairs"),
            col("within_pairs"),
            (col("n_pairs") - col("within_pairs")).as("missed_pairs"),
            det.snap9(col("within_pairs") * 1.0 / col("n_pairs")).as("recall"))
          .orderBy(col("n_shards"))
      }))
}
