package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank invariants (values are pinned by the DuckDB oracle; these
  * pin the mathematical properties on any graph). */
class GraphSpec extends SparkSpec {

  private def edges() = {
    import spark.implicits._
    val e0 = sources.Tables.orders(spark, sf)
      .join(sources.Tables.lineitem(spark, sf), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
  }

  test("rank mass is conserved (no dangling nodes in the bidirectional graph)") {
    import spark.implicits._
    val pr = Graph.pagerank(edges(), iters = 3, damping = 0.85)
    val total = pr.agg(sum($"pr")).as[Double].collect().head
    assert(math.abs(total - 1.0) < 1e-9, s"total rank $total")
  }

  test("ranks are positive and iteration changes the uniform start") {
    import spark.implicits._
    val e = edges()
    val n = e.select($"src").distinct().count()
    val pr = Graph.pagerank(e, iters = 1, damping = 0.85)
    assert(pr.filter($"pr" <= 0).count() == 0)
    // after one iteration a hub must sit above the uniform rank
    val mx = pr.agg(max($"pr")).as[Double].collect().head
    assert(mx > 1.0 / n)
  }

  test("partitioning does not change the ranks (decimal-summed contributions)") {
    import spark.implicits._
    val base = Graph.pagerank(edges(), iters = 2, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val repart = Graph.pagerank(edges().repartition(7), iters = 2, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base == repart)
  }
}
