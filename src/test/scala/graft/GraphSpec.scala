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
    // each edge contribution is snapped to the 1e-9 grid (det.snap9 —
    // the cross-engine decimal-conversion fix), so mass conserves to
    // |E|·iters·5e-10, not machine epsilon; 1e-5 bounds that for this
    // graph with wide margin while still catching any dropped term
    assert(math.abs(total - 1.0) < 1e-5, s"total rank $total")
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

  test("triangle count matches brute force on a known graph") {
    import spark.implicits._
    // K4 (4 triangles... actually C(4,3)=4) plus a pendant edge and a
    // disconnected 3-cycle → 4 + 0 + 1 = 5 triangles
    val k4 = for (i <- 1 to 4; j <- 1 to 4 if i < j) yield (i.toLong, j.toLong)
    val extra = Seq((4L, 5L), (10L, 11L), (11L, 12L), (12L, 10L))
    val e = (k4 ++ extra).toDF("a", "b")
    val r = Graph.triangleCount(e).collect().head
    assert(r.getAs[Long]("triangles") == 5L)
    assert(r.getAs[Long]("edges") == 10L)
    assert(r.getAs[Long]("nodes") == 8L)
  }

  test("label propagation absorbs a star and keeps components separate") {
    import spark.implicits._
    // star around 1 (center label wins every leaf: each leaf's only
    // neighbor is 1) plus a far-away 2-clique that must keep its own
    // community — labels never cross a component boundary
    val e0 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L)).toDF("u", "v")
    val sym = e0.select($"u".as("src"), $"v".as("dst"))
      .union(e0.select($"v".as("src"), $"u".as("dst")))
    val lbl = Graph.labelPropagation(sym, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(2L, 3L, 4L).forall(n => lbl(n) == 1L))
    assert(Set(lbl(10L), lbl(11L)).subsetOf(Set(10L, 11L)))
    // every node keeps exactly one label
    assert(lbl.size == 6)
  }

  test("lpa community sizes partition the node set") {
    import spark.implicits._
    val out = SparkEntry.queries("gx_lpa")(spark, sf).collect()
    val nodes = sources.Tables.lineitem(spark, sf)
      .select((col("l_orderkey") % 29989).as("a"), (col("l_partkey") % 29989).as("b"))
      .filter($"a" =!= $"b")
      .select(explode(array($"a", $"b")).as("n")).distinct().count()
    assert(out.map(_.getAs[Long]("size")).sum == nodes)
    assert(out.length > 1)
  }

  test("modularity: high for planted cliques, near zero for the hashed graph") {
    import spark.implicits._
    // two 4-cliques bridged by one edge: LPA absorbs each clique into
    // one label and modularity must report strong structure
    val cl = (for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)) ++
      (for (i <- 11L to 14L; j <- 11L to 14L if i < j) yield (i, j)) :+ (4L, 11L)
    val e0 = cl.toDF("u", "v")
    val sym = e0.select($"u".as("src"), $"v".as("dst"))
      .union(e0.select($"v".as("src"), $"u".as("dst")))
    val q = Graph.modularity(sym, Graph.labelPropagation(sym, rounds = 3))
      .collect().head
    assert(q.getAs[Long]("edges") == 13L)
    assert(q.getAs[Double]("q_modularity") > 0.3,
      s"planted cliques should score high: $q")
    // the lineitem co-occurrence graph is hash-folded ≈ random: |Q| small
    val rand = SparkEntry.queries("gx_modularity")(spark, sf).collect().head
    assert(math.abs(rand.getAs[Double]("q_modularity")) < 0.05)
  }

  test("triangle count is orientation/duplicate/self-loop insensitive") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    val noisy = e
      .union(e.select($"b".as("a"), $"a".as("b")))   // reversed dups
      .union(Seq((2L, 2L)).toDF("a", "b"))           // self-loop
    val r = Graph.triangleCount(noisy).collect().head
    assert(r.getAs[Long]("triangles") == 1L)
    assert(r.getAs[Long]("edges") == 3L)
  }
}
