package graft.operators

import graft.QueryDef
import org.apache.spark.sql.functions._

/** One synchronized Louvain local-move pass — the community-detection
  * step the gx_ family was missing between LPA (`gx_lpa`, no quality
  * objective) and the partition score (`gx_modularity`). From the
  * singleton partition, the standard Louvain gain for moving node i
  * into neighbor j's (singleton) community reduces to EXACT integers:
  *
  *   dQ(i -> {j}) = 1/m - (k_i * k_j) / (2 m^2)
  *   move iff 2m - k_i * k_j > 0;  argmax dQ = argmin k_j
  *
  * so the whole pass — gain test, argmax with a (k_j, j) total-order
  * tiebreak, synchronized relabel, modularity before/after on the
  * common 4m^2 denominator — is integer arithmetic with one double
  * division per reported Q. No floats inside, bit-portable across
  * engines, and the oracle mirrors it verbatim.
  *
  * This is the SYNCHRONOUS variant (all moves evaluated against the
  * singleton state, applied at once), with the classic swap pathology
  * designed out: a node may only move DOWN the (degree, id) total
  * order — the order is antisymmetric, so no two co-moving nodes can
  * target each other, and the mutual-move case that naive synchronous
  * sweeps turn into a SEPARATION (i labeled j while j is labeled i)
  * cannot occur. Per-node decisions stay embarrassingly parallel, and
  * the pass is two degree joins + one argmin groupBy + the modularity
  * aggregate, all key-partitioned. At 100 TB the same plan holds:
  * candidate moves are an edge-local computation, never a
  * per-community serialization.
  *
  * Reference scope: the reference has no graph layer; this extends the
  * curation-pipeline community toolkit (dedup clusters, LPA, modularity).
  */
object Louvain {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "gx_louvain",
      Some("""
        WITH raw AS (
          SELECT l_orderkey % 29989 AS a, l_partkey % 29989 AS b FROM lineitem),
        e0 AS (
          SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
          FROM raw WHERE a <> b),
        e AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0),
        deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
        m AS (SELECT COUNT(*) AS m FROM e0),
        cand AS (
          SELECT e.src AS node, di.deg AS ki, dj.deg AS kj, e.dst AS j
          FROM e
          JOIN deg di ON di.node = e.src
          JOIN deg dj ON dj.node = e.dst
          WHERE dj.deg < di.deg OR (dj.deg = di.deg AND e.dst < e.src)),
        best AS (
          SELECT node, ki, kj, j FROM (
            SELECT node, ki, kj, j,
                   ROW_NUMBER() OVER (PARTITION BY node ORDER BY kj, j) AS rn
            FROM cand) t
          WHERE rn = 1),
        lbl AS (
          SELECT d.node,
                 CASE WHEN b.node IS NOT NULL AND 2 * m.m - b.ki * b.kj > 0
                      THEN b.j ELSE d.node END AS lbl
          FROM deg d LEFT JOIN best b ON b.node = d.node
          CROSS JOIN m),
        mv AS (SELECT COUNT(*) AS n_moves FROM lbl WHERE lbl <> node),
        dsum AS (
          SELECT l.lbl AS c, SUM(d.deg) AS dc
          FROM lbl l JOIN deg d ON d.node = l.node
          GROUP BY l.lbl),
        intra AS (
          SELECT lu.lbl AS c, COUNT(*) AS lc
          FROM e0
          JOIN lbl lu ON lu.node = e0.u
          JOIN lbl lv ON lv.node = e0.v
          WHERE lu.lbl = lv.lbl
          GROUP BY lu.lbl),
        terms AS (
          SELECT d.c, 4 * m.m * COALESCE(i.lc, 0) - d.dc * d.dc AS num
          FROM dsum d LEFT JOIN intra i ON i.c = d.c
          CROSS JOIN m),
        q0 AS (SELECT COUNT(*) AS n_nodes, SUM(deg * deg) AS sdd FROM deg),
        qt AS (SELECT COUNT(*) AS nc, SUM(num) AS snum FROM terms)
        SELECT CAST(q0.n_nodes AS BIGINT) AS n_nodes,
               CAST(m.m AS BIGINT) AS edges,
               CAST(mv.n_moves AS BIGINT) AS n_moves,
               CAST(qt.nc AS BIGINT) AS n_communities,
               -CAST(q0.sdd AS DOUBLE) / (4.0 * m.m * m.m) AS q_singleton,
               CAST(qt.snum AS DOUBLE) / (4.0 * m.m * m.m) AS q_after
        FROM q0, m, mv, qt
      """.trim),
      (s, d) => {
        val sym = Graph.cooccurSym(s, d)
        val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        val m = sym.filter(col("src") < col("dst")).agg(count(lit(1)).as("m"))
        // per-node best candidate among DOWN-ORDER neighbors — the
        // struct MIN is the deterministic (k_j, j) tiebreak; the order
        // filter makes mutual targeting impossible
        val cand = sym
          .join(deg.select(col("node").as("src"), col("deg").as("ki")), "src")
          .join(deg.select(col("node").as("dst"), col("deg").as("kj")), "dst")
          .filter(col("kj") < col("ki")
            || (col("kj") === col("ki") && col("dst") < col("src")))
        val best = cand.groupBy(col("src").as("node"))
          .agg(min(col("ki")).as("ki"), // constant per node
            min(struct(col("kj"), col("dst").as("j"))).as("mn"))
          .select(col("node"), col("ki"),
            col("mn.kj").as("kj"), col("mn.j").as("j"))
        // synchronized move: every decision is against the singleton
        // state, then applied at once; order-maximal nodes (no
        // down-order neighbor) keep their own label via the left join
        val lbl = deg.select(col("node"))
          .join(best, Seq("node"), "left")
          .crossJoin(broadcast(m))
          .select(col("node"),
            when(col("j").isNotNull
              && lit(2) * col("m") - col("ki") * col("kj") > 0, col("j"))
              .otherwise(col("node")).as("lbl"))
          .persist()
        val moves = lbl.filter(col("lbl") =!= col("node"))
          .agg(count(lit(1)).as("n_moves"))
        val nodes = deg.agg(count(lit(1)).as("n_nodes"),
          sum(col("deg") * col("deg")).as("sdd"))
        val mod = Graph.modularity(sym, lbl)
        nodes.crossJoin(broadcast(moves)).crossJoin(broadcast(mod))
          .select(col("n_nodes"), col("edges"), col("n_moves"),
            col("n_communities"),
            (-col("sdd").cast("double")
              / (lit(4.0) * col("edges") * col("edges"))).as("q_singleton"),
            col("q_modularity").as("q_after"))
      }))
}
