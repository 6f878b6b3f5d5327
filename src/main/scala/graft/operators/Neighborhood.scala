package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Neighborhood function (distance distribution) from a seed sample —
  * the building block of effective-diameter estimation. From the 10
  * lowest-id customer nodes of the bipartite purchase graph, expand
  * breadth-first to radius 3 and report how many (seed, node) pairs
  * are reachable within each radius.
  *
  * Each round is one equi-join frontier ⋈ edges plus a distinct — both
  * hash-shuffles on node id, state bounded by |seeds|·|nodes| pairs,
  * nothing driver-side but the four per-radius counts. This is the
  * exact small-seed-sample variant; the all-sources production path at
  * 100 TB is HyperANF (Boldi–Rosa–Vigna WWW'11): replace the explicit
  * (seed, node) pair set with per-node HLL registers merged along
  * edges, which [[Sketches]]' HLL merge already demonstrates. The
  * DuckDB oracle is a recursive CTE over the same edge list with
  * min-depth per pair — integer counts, bit-exact.
  */
object Neighborhood {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "gx_neighborhood",
      Some("""
        WITH RECURSIVE e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        seeds AS (
          SELECT src AS seed FROM (
            SELECT DISTINCT src FROM e WHERE src % 2 = 0 ORDER BY src LIMIT 10)),
        walk(seed, node, depth) AS (
          SELECT seed, seed, 0 FROM seeds
          UNION
          SELECT w.seed, e.dst, w.depth + 1
          FROM walk w JOIN e ON e.src = w.node WHERE w.depth < 3),
        md AS (SELECT seed, node, MIN(depth) AS d FROM walk GROUP BY 1, 2)
        SELECT CAST(t.r AS BIGINT) AS radius,
               CAST(COUNT(*) AS BIGINT) AS pairs_reachable
        FROM range(0, 4) AS t(r) JOIN md ON md.d <= t.r
        GROUP BY t.r ORDER BY radius
      """.trim),
      (s, d) => {
        import s.implicits._
        val e0 = orders(s, d)
          .join(lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
          .distinct()
        val e = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
          .persist()
        val seeds = e.filter($"src" % 2 === 0).select($"src").distinct()
          .orderBy($"src").limit(10).select($"src".as("seed"))
        // frontier-only expansion: each round joins ONLY the nodes first
        // reached last round (not the whole accumulated reach set), and
        // the anti-join keeps the union disjoint so no global distinct
        // over the growing pair set is ever needed — per-round cost is
        // proportional to the new frontier, the textbook BFS discipline
        var reach = seeds.select($"seed", $"seed".as("node")).persist()
        var frontier = reach
        val counts = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        var total = reach.count()
        counts += ((0L, total))
        for (r <- 1 to 3) {
          val cand = frontier.as("f")
            .join(e.as("ed"), $"f.node" === $"ed.src")
            .select($"f.seed".as("seed"), $"ed.dst".as("node"))
            .distinct()
          val fresh = cand.join(reach, Seq("seed", "node"), "left_anti").persist()
          total += fresh.count()
          counts += ((r.toLong, total))
          val grown = reach.union(fresh).persist()
          reach.unpersist()
          reach = grown
          frontier = fresh
        }
        reach.unpersist(); e.unpersist()
        s.createDataFrame(counts.toSeq).toDF("radius", "pairs_reachable")
          .orderBy($"radius")
      }))
}
