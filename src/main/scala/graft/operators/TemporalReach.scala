package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Time-respecting (temporal) reachability — which customers can a
  * seed customer "influence" through a supplier it ordered from
  * EARLIER: a 2-hop temporal path seed →(t₁) supplier →(t₂) customer
  * with t₂ > t₁. Static reachability overcounts influence in temporal
  * networks (Holme & Saramäki, Phys. Rep. 2012); the increasing-time
  * constraint is what makes a path causally traversable.
  *
  * Per seed (every 97th customer key): the count of distinct other
  * customers temporally reached and the earliest reach date.
  *
  * Determinism: all dates/counts exact; earliest-reach emitted as an
  * ISO string.
  *
  * Scale: the trade triples are reduced to DISTINCT (cust, supp,
  * first-date) before any expansion; both hops are supplier-keyed
  * equi-joins (the temporal predicate rides inside the key's rows),
  * so the dataflow is hash-partitioned joins + two aggregates — no
  * per-pair materialization beyond the genuine 2-hop motif set, and
  * the seed filter prunes hop-1 to |seeds| fan-out.
  */
object TemporalReach {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "gx_temporal_reach",
      Some("""
        WITH co AS (
          SELECT o_custkey AS c, l_suppkey AS s,
                 MIN(CAST(o_orderdate AS DATE)) AS t
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1, 2),
        seeds AS (SELECT DISTINCT c FROM co WHERE c % 97 = 0),
        hop1 AS (
          SELECT co.c AS seed, co.s, MIN(co.t) AS t1
          FROM co JOIN seeds ON seeds.c = co.c
          GROUP BY 1, 2),
        hop2 AS (
          SELECT h.seed, co.c AS reached, MIN(co.t) AS t2
          FROM hop1 h JOIN co ON co.s = h.s AND co.t > h.t1
          WHERE co.c <> h.seed
          GROUP BY 1, 2)
        SELECT CAST(seed AS BIGINT) AS seed,
               CAST(COUNT(*) AS BIGINT) AS n_reached,
               CAST(MIN(t2) AS VARCHAR) AS first_reach
        FROM hop2
        GROUP BY seed
        ORDER BY seed
      """.trim),
      (s, d) => {
        val co = orders(s, d)
          .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
          .agg(min(col("o_orderdate").cast("date")).as("t"))
        val seeds = co.filter(col("c") % 97 === 0)
          .select(col("c").as("seed")).distinct()
        val hop1 = co.join(seeds, col("c") === col("seed"))
          .groupBy(col("seed"), col("s").as("h_s"))
          .agg(min(col("t")).as("t1"))
        val hop2 = hop1.join(co,
            col("h_s") === col("s") && col("t") > col("t1")
              && col("c") =!= col("seed"))
          .groupBy(col("seed"), col("c").as("reached"))
          .agg(min(col("t")).as("t2"))
        hop2.groupBy(col("seed"))
          .agg(count(lit(1)).as("n_reached"),
            date_format(min(col("t2")), "yyyy-MM-dd").as("first_reach"))
          .select(col("seed").cast("long").as("seed"),
            col("n_reached").cast("long").as("n_reached"), col("first_reach"))
          .orderBy(col("seed"))
      }))
}
