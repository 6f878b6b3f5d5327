package graft.operators

import graft.QueryDef
import graft.sources.Tables.lineitem
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stress centrality (Shimbel 1953): the number of shortest paths that
  * pass strictly through a node — the integer-valued sibling of
  * betweenness (which divides each path by σ_st). Computed exactly on
  * the sampled-seed, radius-4 regime the gx_closeness estimator
  * already uses: per seed s, a Brandes-style forward sweep counts
  * shortest paths σ_sv by BFS level, a backward sweep counts DAG
  * continuations τ(v) = 1 + Σ_succ τ(w), and v's credit from s is
  * σ_sv·(τ(v)−1) — the number of (s,t) shortest paths with v strictly
  * interior. All counts are integers, so the oracle (which enumerates
  * the shortest walks with a recursive CTE carrying the path and
  * unnests interior nodes) agrees bit-for-bit despite computing the
  * same total by a completely different grouping.
  *
  * Scale: forward and backward are 4 fixed rounds each of
  * frontier ⋈ edges hash joins on node id — per-(seed,node) state,
  * never a path materialization (paths are exponential; the DAG DP is
  * why Brandes 2001 replaced them). Seeds are the budget knob exactly
  * as in gx_closeness.
  */
object Stress {

  private val maxHops = 4

  /** Forward: (seed, node, dist, sigma) for all nodes within maxHops.
    * Level l's new nodes are candidates not yet visited; σ sums the
    * σ of their level-(l−1) DAG predecessors. */
  private def forward(edges: DataFrame, seeds: DataFrame): DataFrame = {
    var state = seeds.select(col("node").as("seed"), col("node"),
      lit(0).as("dist"), lit(1L).as("sigma"))
    for (l <- 1 to maxHops) {
      val cand = state.filter(col("dist") === l - 1)
        .join(edges, col("node") === col("u"))
        .select(col("seed"), col("v").as("node"), col("sigma"))
      val fresh = cand
        .join(state.select(col("seed"), col("node")), Seq("seed", "node"),
          "left_anti")
        .groupBy(col("seed"), col("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("seed"), col("node"), lit(l).as("dist"), col("sigma"))
      state = state.unionByName(fresh).localCheckpoint()
    }
    state
  }

  /** Backward: τ(v) = 1 + Σ over same-seed neighbors one level deeper.
    * Walks levels maxHops−1 … 0 so each level's τ is final when used. */
  private def backward(edges: DataFrame, state: DataFrame): DataFrame = {
    var tau = state.filter(col("dist") === maxHops)
      .select(col("seed"), col("node"), col("dist"), col("sigma"),
        lit(1L).as("tau"))
    for (l <- maxHops - 1 to 0 by -1) {
      val cur = state.filter(col("dist") === l)
      val fromSucc = cur
        .join(edges, col("node") === col("u"))
        .select(col("seed"), col("node"), col("v"))
        .join(tau.filter(col("dist") === l + 1)
          .select(col("seed"), col("node").as("v"), col("tau").as("stau")),
          Seq("seed", "v"))
        .groupBy(col("seed"), col("node"))
        .agg(sum(col("stau")).as("stau"))
      val curTau = cur.join(fromSucc, Seq("seed", "node"), "left")
        .select(col("seed"), col("node"), col("dist"), col("sigma"),
          (lit(1L) + coalesce(col("stau"), lit(0L))).as("tau"))
      tau = tau.unionByName(curTau).localCheckpoint()
    }
    tau
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "gx_stress",
      Some("""
        WITH RECURSIVE e0 AS (
          SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b FROM lineitem
          WHERE l_quantity = 1 AND (l_partkey * 31 + l_suppkey) % 3 = 0),
        edges AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        walk(seed, node, dist, path) AS (
          SELECT node, node, 0, [node] FROM nodes WHERE node % 11 = 3
          UNION ALL
          SELECT w.seed, e.b, w.dist + 1, list_append(w.path, e.b)
          FROM walk w JOIN edges e ON e.a = w.node
          WHERE w.dist < 4),
        md AS (
          SELECT seed, node, MIN(dist) AS md FROM walk GROUP BY seed, node),
        sp AS (
          SELECT w.seed, w.node, w.path
          FROM walk w JOIN md ON md.seed = w.seed AND md.node = w.node
                             AND w.dist = md.md),
        interior AS (
          SELECT unnest(list_slice(path, 2, len(path) - 1)) AS node
          FROM sp WHERE len(path) > 2)
        SELECT CAST(node AS BIGINT) AS node,
               CAST(COUNT(*) AS BIGINT) AS stress
        FROM interior GROUP BY node
        ORDER BY stress DESC, node
        LIMIT 20
      """.trim),
      (s, d) => {
        val e0 = lineitem(s, d)
          .filter(col("l_quantity") === 1 &&
            (col("l_partkey") * 31 + col("l_suppkey")) % 3 === 0)
          .select((col("l_partkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
          .distinct()
        val sym = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
          .repartition(8, col("u")).persist() // partition count follows data volume (gx weak-row lesson)
        val seeds = sym.select(col("u").as("node")).distinct()
          .filter(col("node") % 11 === 3)
        val tau = backward(sym, forward(sym, seeds))
        tau.filter(col("dist") >= 1)
          .select(col("node"), (col("sigma") * (col("tau") - 1)).as("credit"))
          .groupBy(col("node"))
          .agg(sum(col("credit")).as("stress"))
          .filter(col("stress") > 0)
          .orderBy(col("stress").desc, col("node"))
          .limit(20)
      }))
}
