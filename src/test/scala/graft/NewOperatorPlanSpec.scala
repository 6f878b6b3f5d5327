package graft

/** Plan-shape pins for the round-5 operators: each assertion is a
  * scale property the operator's Scaladoc claims — top-k via
  * TakeOrderedAndProject (never a global sort), the interval-merge
  * windows sharing ONE partition exchange, link prediction's
  * degree-table joins broadcast, and HITS keeping its only
  * nest-loop joins to the 1-row normalizer broadcasts. If a future
  * refactor regresses a plan (e.g. a global Sort sneaks in under the
  * fusion top-k), these fail before the bench does.
  */
class NewOperatorPlanSpec extends SparkSpec {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("rrf fusion and jaccard link prediction are top-k plans, not global sorts") {
    for (q <- Seq("rag_rrf_fusion", "gx_jaccard_linkpred")) {
      val plan = executedPlan(q)
      assert(plan.contains("TakeOrderedAndProject"), s"$q lost its top-k plan:\n$plan")
    }
  }

  test("interval merge shares one window exchange and one final sort") {
    val plan = executedPlan("ev_interval_merge")
    // both running windows use the same (user, start, end, id) ordering:
    // Spark must plan them over a single hash exchange on user_id, so
    // the only exchanges are that one plus the presentation sort
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges <= 2, s"expected <=2 shuffle exchanges, got $exchanges:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("link prediction joins its degree table by broadcast") {
    val plan = executedPlan("gx_jaccard_linkpred")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("hits ends in two top-k reads of the checkpointed score tables") {
    val plan = executedPlan("gx_hits")
    // the integer recurrence lives behind the two final localCheckpoints;
    // the read-time plan is exactly: per side, a keyless total sum over
    // the checkpointed RDD, a 1-row broadcast normalize, and a
    // TakeOrderedAndProject head — then union + presentation sort. No
    // keyed aggregate and no shuffled join may re-derive iteration work.
    val topK = plan.linesIterator.count(_.contains("TakeOrderedAndProject"))
    assert(topK == 2, s"expected 2 top-k heads, got $topK:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"unexpected shuffled join after the checkpoints:\n$plan")
    val keyedAggs = plan.linesIterator
      .count(l => l.contains("HashAggregate(keys=[") && !l.contains("HashAggregate(keys=[]"))
    assert(keyedAggs == 0, s"keyed aggregate re-derives iteration work:\n$plan")
  }

  test("z-order audit joins nothing — two aggregation passes and a union") {
    val plan = executedPlan("pl_zorder_layout")
    assert(!plan.contains("Join"), s"unexpected join in a pure aggregation plan:\n$plan")
    assert(plan.contains("Union"), plan)
  }

  test("co-purchase lift is a top-k with broadcast frequency sides") {
    val plan = executedPlan("q51_copurchase_lift")
    assert(plan.contains("TakeOrderedAndProject"), s"q51 lost its top-k plan:\n$plan")
    // the part-frequency dimension tables and the 1-row order count
    // ride in by broadcast; only the items self-join may shuffle
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dsir and prf expansion rank by top-k with broadcast term tables") {
    for (q <- Seq("ta_dsir_bits", "rag_prf_expansion")) {
      val plan = executedPlan(q)
      assert(plan.contains("TakeOrderedAndProject"), s"$q lost its top-k plan:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast side:\n$plan")
    }
  }

  test("cuped reuses the per-user aggregate exchange for both moment passes") {
    val df = SparkEntry.queries("ev_cuped")(spark, sf)
    // force execution so AQE finalizes reuse decisions
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the global-moment side is a 1-row broadcast onto the 2-row
    // variant side — no shuffled join may appear anywhere
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"unexpected shuffled join:\n$plan")
  }
}
