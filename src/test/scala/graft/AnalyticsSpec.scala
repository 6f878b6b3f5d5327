package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Structural properties of the event-sequence analytics queries
  * (values are pinned by the DuckDB oracle; these pin the invariants
  * that must hold on ANY corpus). */
class AnalyticsSpec extends SparkSpec {

  private def q(name: String) =
    Analytics.defs.find(_.name == name).get.fn(spark, sf)

  test("funnel stages are monotonically non-increasing") {
    val stages = q("ev_funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(stages("1_view") >= stages("2_click"))
    assert(stages("2_click") >= stages("3_purchase"))
    assert(stages("1_view") > 0)
  }

  test("retention day-0 row covers every signup cohort user exactly once") {
    import spark.implicits._
    val ret = q("ev_retention")
    // day 0 of each cohort counts each signup user once (they were
    // active on their signup day by definition)
    val day0 = ret.filter($"day_offset" === 0)
      .agg(sum($"users")).as[Long].collect().head
    val signupUsers = sources.Tables.events(spark, sf)
      .filter($"event_type" === "signup")
      .select($"user_id").distinct().count()
    assert(day0 == signupUsers)
    // offsets are never negative and counts never exceed the cohort size
    assert(ret.filter($"day_offset" < 0).count() == 0)
  }

  test("user paths partition the user population") {
    import spark.implicits._
    val paths = q("ev_user_paths")
    val totalUsers = paths.agg(sum($"n")).as[Long].collect().head
    val distinctUsers = sources.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(totalUsers == distinctUsers)
    // every path has at most 3 steps
    val maxSteps = paths.select(size(split($"path", ">")).as("k"))
      .agg(max($"k")).as[Int].collect().head
    assert(maxSteps <= 3)
  }
}
