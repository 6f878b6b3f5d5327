package graft

import graft.operators.{Cdc, Changepoint, KnnGraph}
import org.apache.spark.sql.functions._

/** Structural invariants of the CDC-chunking, kNN-graph, and
  * change-detection operators. */
class CdcKnnSpec extends SparkSpec {

  private def q(defs: Seq[QueryDef], name: String) =
    defs.find(_.name == name).get.fn(spark, sf)

  test("cdc chunks: every reported block is a real cross-copy duplicate") {
    import spark.implicits._
    val c = q(Cdc.defs, "dd_cdc_chunks").cache()
    assert(c.filter($"n_copies" < 2).count() == 0)
    assert(c.filter($"n_docs" > $"n_copies").count() == 0)
    assert(c.filter($"chunk_len" < 1).count() == 0)
  }

  test("cdc chunking is shift-tolerant where fixed windows are not") {
    // Inserting one token before a repeated block must not change the
    // content of chunks that start at a content-defined boundary
    // after the insertion point — the defining CDC property. We check
    // a weaker, corpus-level consequence that must hold by
    // construction: chunk boundaries depend only on token content, so
    // two docs sharing a long run of tokens produce at least one
    // identical interior chunk, which the rollup then reports.
    val c = q(Cdc.defs, "dd_cdc_chunks")
    assert(c.count() > 0, "sf0.001 corpus has repeated text, CDC must find some")
  }

  test("knn graph: mutual, canonical, and cosine-valid") {
    import spark.implicits._
    val g = q(KnnGraph.defs, "sim_knn_graph").cache()
    assert(g.filter($"u" >= $"v").count() == 0)
    assert(g.filter($"cos" < -1.0000001 || $"cos" > 1.0000001).count() == 0)
    // mutual-kNN degree bound: every node appears in at most k=5 edges
    val degs = g.select($"u".as("n")).union(g.select($"v".as("n")))
      .groupBy($"n").count()
    assert(degs.filter($"count" > 5).count() == 0)
  }

  test("changepoint: split SSE never exceeds total SSE, segment sizes add up") {
    import spark.implicits._
    val cp = q(Changepoint.defs, "ts_changepoint").cache()
    assert(cp.count() > 0)
    assert(cp.filter($"sse_split" > $"sse_total" + 1e-6).count() == 0)
    assert(cp.filter($"n_before" < 1 || $"n_after" < 1).count() == 0)
  }

  test("gini: in [0,1] for nonnegative user totals") {
    val r = q(Changepoint.defs, "ev_gini").collect().head
    val g = r.getAs[Double]("gini")
    assert(r.getAs[Long]("n_users") > 0)
    assert(g >= -1e-9 && g <= 1.0)
  }
}
