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
    // The defining CDC property: PREPENDING tokens to a document
    // leaves every chunk that starts at a content-defined boundary
    // after the insertion identical — a fixed-window chunker re-aligns
    // everything and shares nothing. Build a long deterministic token
    // run, chunk it, then chunk the same run shifted by a 7-token
    // prefix, and require that most interior chunks survive verbatim.
    import spark.implicits._
    val run = (0 until 4000).map(i => s"w${i % 997}").mkString(" ")
    val shifted = (0 until 7).map(i => s"pre$i").mkString(" ") + " " + run
    val docs = Seq((1L, run), (2L, shifted)).toDF("doc_id", "text")
    val ch = graft.operators.Cdc.cdcChunks(docs).cache()
    val h1 = ch.filter($"doc_id" === 1).select($"h").as[String].collect().toSet
    val h2 = ch.filter($"doc_id" === 2).select($"h").as[String].collect().toSet
    val shared = h1.intersect(h2).size
    // everything after the first boundary past the prefix must match:
    // allow the one or two chunks the insertion actually touches
    assert(shared >= h1.size - 2,
      s"CDC must re-sync after the shift: shared=$shared of ${h1.size}")
    assert(h1.size > 10, "the run must split into many chunks for the test to bite")
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

  test("ivf knn graph: recall row internally consistent") {
    val r = q(KnnGraph.defs, "sim_knn_graph_recall").collect().head
    val (ne, ni, ns) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_ivf"),
      r.getAs[Long]("n_shared"))
    assert(ns <= ne && ns <= ni)
    val rec = r.getAs[Double]("edge_recall")
    assert(rec >= 0.0 && rec <= 1.0)
    // the multi-probe candidate set must recover a usable majority
    assert(rec > 0.5, s"IVF knn-graph recall collapsed: $rec")
  }
}
