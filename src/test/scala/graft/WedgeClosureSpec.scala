package graft

import org.apache.spark.sql.functions._

/** Result-identity of the two wedge-closure regimes (r11 verdict #4):
  * the broadcast path (|E| under the ceiling) and the bloom-pre-join
  * escalation (past broadcast reach) must close exactly the same
  * wedges — the bloom only PRE-filters (false positives allowed), the
  * shuffled semi-join after it is exact, so the composed operator is
  * exact too. Pinned on the real fixture graph, not a toy. */
class WedgeClosureSpec extends SparkSpec {

  private def fixtureGraph() = {
    val edges = sources.Tables.lineitem(spark, sf)
      .select((col("l_orderkey") % 29989).as("a"),
        (col("l_partkey") % 29989).as("b"))
    operators.Graph.canonicalEdges(edges)
  }

  test("bloom escalation closes exactly the wedges the broadcast path closes") {
    val e = fixtureGraph()
    val w1 = e.select(col("u").as("src"), col("v").as("x"))
    val w2 = e.select(col("u").as("src"), col("v").as("y"))
    val wedges = w1.join(w2, "src").filter(col("x") < col("y"))
    def run(threshold: Long, safeBytes: Long) =
      operators.Graph.closeWedges(wedges, e, "x", "y", threshold, safeBytes)
        .select(col("src"), col("x"), col("y"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    val viaBroadcast = run(Long.MaxValue, Long.MaxValue) // always under: broadcast
    val viaBloom = run(0L, 0L)                           // always over: bloom + semi
    assert(viaBroadcast.nonEmpty, "fixture graph closed no wedges — vacuous test")
    assert(viaBroadcast == viaBloom)
  }

  test("threshold routes the plan: broadcast under, bloom filter over") {
    val e = fixtureGraph()
    val wedges = e.select(col("u").as("src"), col("v").as("x"))
      .join(e.select(col("u").as("src"), col("v").as("y")), "src")
      .filter(col("x") < col("y"))
    val under = operators.Graph
      .closeWedges(wedges, e, "x", "y", Long.MaxValue, Long.MaxValue)
      .queryExecution.executedPlan.toString
    assert(under.contains("BroadcastHashJoin"), under)
    val over = operators.Graph.closeWedges(wedges, e, "x", "y", 0L, 0L)
      .queryExecution.optimizedPlan.toString
    // the bloom path's signature is the map-side might-contain filter;
    // the exact semi-join after it is free to take whatever physical
    // shape AQE picks at this data size
    assert(over.contains("UDF"), over)
  }
}
