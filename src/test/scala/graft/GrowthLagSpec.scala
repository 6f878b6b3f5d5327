package graft

import graft.operators.GrowthLag
import org.apache.spark.sql.functions._

/** Structural invariants of the Heaps-law curve and conversion-lag
  * quantiles. */
class GrowthLagSpec extends SparkSpec {

  private def q(name: String) =
    GrowthLag.defs.find(_.name == name).get.fn(spark, sf)

  test("heaps law: 10 checkpoints, all monotone non-decreasing, vocab <= tokens") {
    import spark.implicits._
    val h = q("ta_heaps_law").collect().sortBy(_.getAs[Long]("checkpoint"))
    assert(h.length == 10)
    def mono(f: org.apache.spark.sql.Row => Long) =
      h.sliding(2).forall { case Array(a, b) => f(b) >= f(a) }
    assert(mono(_.getAs[Long]("n_docs")))
    assert(mono(_.getAs[Long]("cum_tokens")))
    assert(mono(_.getAs[Long]("vocab")))
    assert(h.forall(r => r.getAs[Long]("vocab") <= r.getAs[Long]("cum_tokens")))
    // final checkpoint covers the whole corpus
    assert(h.last.getAs[Long]("n_docs") ==
      sources.Tables.documents(spark, sf).count())
  }

  test("conversion lag: quartiles ordered, nonnegative") {
    val r = q("ev_conversion_lag").collect().head
    val (p25, p50, p75, mx) = (r.getAs[Long]("p25_s"), r.getAs[Long]("p50_s"),
      r.getAs[Long]("p75_s"), r.getAs[Long]("max_s"))
    assert(r.getAs[Long]("n_converted") > 0)
    assert(p25 >= 0 && p25 <= p50 && p50 <= p75 && p75 <= mx)
  }
}
