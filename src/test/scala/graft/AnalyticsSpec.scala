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

  test("stickiness: dau never exceeds wau and the ratio is in (0, 1]") {
    import spark.implicits._
    val st = q("ev_stickiness").collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      val dau = r.getAs[Long]("dau")
      val wau = r.getAs[Long]("wau")
      val ratio = r.getAs[Double]("stickiness")
      assert(dau >= 1 && dau <= wau)
      assert(ratio > 0.0 && ratio <= 1.0)
      assert(math.abs(ratio - dau.toDouble / wau) < 1e-12)
    }
  }

  test("rfm: closed-form quintiles match Spark's own ntile and balance to ±1") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rfm = q("ev_rfm").cache()
    // every score in 1..5 and the composite is positional arithmetic
    rfm.collect().foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 1 && v <= 5, s"$c=$v")
      }
      assert(r.getAs[Long]("rfm") ==
        r.getAs[Long]("r_score") * 100 + r.getAs[Long]("f_score") * 10 +
          r.getAs[Long]("m_score"))
    }
    // the globalRank+closed-form path must equal the window ntile it
    // replaces (small data: the single-partition window is the truth)
    val viaWindow = rfm.select($"user_id", $"f_score",
      ntile(5).over(Window.orderBy($"frequency", $"user_id")).cast("long")
        .as("expect"))
    assert(viaWindow.filter($"f_score" =!= $"expect").count() == 0)
    // bucket sizes differ by at most one per metric
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = rfm.groupBy(col(c)).count().as[(Long, Long)]
        .collect().map(_._2)
      assert(sizes.max - sizes.min <= 1, s"$c buckets: ${sizes.mkString(",")}")
    }
    rfm.unpersist()
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
