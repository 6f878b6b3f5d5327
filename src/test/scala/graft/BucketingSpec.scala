package graft


import org.apache.spark.sql.functions._

/** Bucketing demo: pre-bucketed fact tables joined on the bucket key
  * produce a shuffle-free sort-merge join — the co-located-join pattern
  * for repeated large joins at cluster scale (pay one shuffle at write
  * time, amortized over every subsequent join).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    // warehouse dir is a static conf — SparkSpec points it at a temp dir
    val orders = sources.Tables.orders(spark, sf)
    val lineitem = sources.Tables.lineitem(spark, sf)
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    lineitem.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce an Exchange; the only
      // exchange allowed is the one for the final groupBy
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan.take(1500))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"), plan.take(1500))
      assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
        plan.take(800))
      // and results match the unbucketed join
      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
