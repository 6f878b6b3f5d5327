package graft

/** Plan-shape pins for the round-6 fixes and operators — each pin is a
  * scale property the Scaladoc claims, asserted so a refactor
  * regressing the plan fails in `sbt test` before any bench run:
  *
  *  - the day-grid rollups must NEVER plan a BroadcastNestedLoopJoin
  *    (the explode + equi-join rewrite is the round-6 fix; the BNLJ
  *    was |days|×|events| predicate evaluations);
  *  - the dHash dedup must stay on the banded equi-join (same rule);
  *  - the matrix profile's candidate join is an equi-join and its
  *    distance fold is row-local (no per-element shuffle);
  *  - late interaction keeps its first-stage bound (top-50 window,
  *    broadcast query tokens).
  */
class RollupPlanSpec extends SparkSpec {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("day-grid rollups plan explode + equi-join, never a nested-loop join") {
    for (q <- Seq("ev_rolling_distinct", "ev_rolling_distinct_hll", "ev_stickiness")) {
      val plan = executedPlan(q)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q regressed to a nested-loop range join:\n$plan")
      assert(plan.contains("Generate"), s"$q lost its explode fan-out:\n$plan")
      // toString renders join type after the keys: "BroadcastHashJoin
      // [day#1], [day#2], LeftSemi, BuildRight"
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
        s"$q lost the grid semi-join:\n$plan")
    }
  }

  test("dHash dedup candidates come from the banded equi-join") {
    val plan = executedPlan("mm_dhash_dedup")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"banding regressed to all-pairs:\n$plan")
    // the band equi-join may be broadcast or shuffled depending on
    // stats; either hash form is fine, a nested loop is not
    assert(plan.contains("HashJoin"), plan)
  }

  test("matrix profile: banded equi-join candidates, no range-predicate join") {
    val plan = executedPlan("ts_matrix_profile")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"band regressed to a nested-loop range join:\n$plan")
    assert(plan.contains("Generate"), s"lost the offset explode:\n$plan")
  }

  test("late interaction: broadcast query tokens, windowed candidate cap") {
    val plan = executedPlan("rag_late_interaction")
    assert(plan.contains("BroadcastHashJoin"),
      s"query-token side must broadcast:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
