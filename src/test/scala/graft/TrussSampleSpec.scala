package graft

import graft.operators.{PrioritySample, Truss}
import org.apache.spark.sql.functions.abs

/** Structural invariants of priority sampling and the truss peel. */
class TrussSampleSpec extends SparkSpec {

  private def q(defs: Seq[QueryDef], name: String) =
    defs.find(_.name == name).get.fn(spark, sf)

  test("priority sample: at most 50 rows, estimates dominate weights") {
    import spark.implicits._
    val p = q(PrioritySample.defs, "pl_priority_sample").cache()
    assert(p.count() <= 50 && p.count() > 0)
    // HT estimate max(w, tau) is never below the raw weight
    assert(p.filter($"est_weight" < $"n_tokens" - 1e-9).count() == 0)
    assert(p.select($"doc_id").distinct().count() == p.count())
  }

  test("truss peel: monotone edges, round-2 input equals round-1 output") {
    val rows = q(Truss.defs, "gx_ktruss").collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 2)
    val r1 = rows(0); val r2 = rows(1)
    assert(r1.getAs[Long]("edges_kept") <= r1.getAs[Long]("edges_in"))
    assert(r2.getAs[Long]("edges_in") == r1.getAs[Long]("edges_kept"))
    assert(r2.getAs[Long]("edges_kept") <= r2.getAs[Long]("edges_in"))
    // every kept edge was in >= 1 triangle, so 3*triangles >= kept edges
    assert(3 * r1.getAs[Long]("triangles") >= r1.getAs[Long]("edges_kept"))
  }

  test("mann-kendall: |S| <= n_pairs and tau = S/n_pairs") {
    import spark.implicits._
    val mk = q(graft.operators.TrendTests.defs, "ts_mann_kendall").cache()
    assert(mk.count() > 0)
    assert(mk.filter(abs($"mk_s") > $"n_pairs").count() == 0)
    assert(mk.filter(abs($"mk_tau") > 1.0).count() == 0)
  }

  test("entropy rate: bits nonnegative, bounded by log2 of fan-out") {
    import spark.implicits._
    val er = q(graft.operators.TrendTests.defs, "ev_entropy_rate").cache()
    assert(er.count() > 0)
    assert(er.filter($"mean_bits" < 0).count() == 0)
    assert(er.filter($"total_bits" < 0).count() == 0)
  }
}
