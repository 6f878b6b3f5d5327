package graft

/** Plan pins + invariants for the late round-5 operators: the
  * interval-overlap join must stay an equi-join (its whole point is
  * avoiding the unbounded inequality join the oracle runs), the
  * leakage audit must stay on banded candidates, TextRank keeps a
  * top-k head, and the Markov attribution obeys the probability
  * axioms its construction promises.
  */
class LateOperatorsSpec extends SparkSpec {

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("interval overlap joins on day cells — no cartesian or nested-loop candidate join") {
    val plan = executedPlan("jx_interval_overlap")
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
    // the only nested-loop joins permitted are 1-row broadcasts; the
    // candidate join itself must be hash-based on the cell key
    assert(plan.contains("Join") && plan.contains("cell"), plan)
    assert(plan.contains("TakeOrderedAndProject"), s"lost the top-k head:\n$plan")
  }

  test("split leakage rides the banded candidate join, never all-pairs") {
    val plan = executedPlan("pl_split_leakage")
    assert(!plan.contains("CartesianProduct"), s"all-pairs crept in:\n$plan")
  }

  test("textrank ends in a top-k head") {
    val plan = executedPlan("ta_textrank")
    assert(plan.contains("TakeOrderedAndProject"), s"lost the top-k head:\n$plan")
  }

  test("markov attribution: probabilities and removal effects obey their axioms") {
    val rows = SparkEntry.queries("ev_attribution_markov")(spark, sf).collect()
    assert(rows.length == 4)
    for (r <- rows) {
      val (base, removed, eff) = (r.getAs[Double]("p_conv_base"),
        r.getAs[Double]("p_conv_removed"), r.getAs[Double]("removal_effect"))
      assert(base > 0.0 && base <= 1.0, s"base $base")
      // voiding a channel can only remove conversion mass
      assert(removed >= 0.0 && removed <= base + 1e-9, s"removed $removed > base $base")
      assert(eff >= -1e-9 && eff <= 1.0, s"effect $eff")
    }
    // every channel appears on some converting path in the synthetic
    // stream, so every removal effect is strictly positive
    assert(rows.forall(_.getAs[Double]("removal_effect") > 0.0))
  }

  test("backtest: seasonal-naive beats nothing on a near-Poisson series by a wide margin") {
    val rows = SparkEntry.queries("ts_backtest")(spark, sf).collect()
      .map(r => r.getAs[String]("model") -> r.getAs[Double]("mae")).toMap
    assert(rows.keySet == Set("ma24", "naive", "snaive24"))
    // counts are near-independent across hours: the 24h moving average
    // (variance/24 estimator of the level) must beat both single-lag
    // forecasters, whose error variance is 2x the series variance
    assert(rows("ma24") < rows("naive") && rows("ma24") < rows("snaive24"),
      s"ma24 ${rows("ma24")} vs naive ${rows("naive")} / snaive ${rows("snaive24")}")
  }
}
