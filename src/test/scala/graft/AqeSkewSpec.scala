package graft

import org.apache.spark.sql.functions._

/** AQE skew-join demonstration — the runtime complement to the manual
  * salting in `jx_salted_join` (operators.Skew): with adaptive
  * execution on, a hot key that would pin one shuffle partition is
  * split at RUNTIME by OptimizeSkewedJoin (the reducer reads the
  * oversized map output in slices), with no salting column and no
  * rewrite of the query. At 100 TB this is the first line of defense
  * for mild-to-moderate skew; salting remains the answer when one key
  * alone exceeds what any split count can balance or when the join is
  * not sort-merge. Thresholds here are shrunk so the tiny local
  * dataset trips the same code path a production skew would. */
class AqeSkewSpec extends SparkSpec {

  private val tuned = Seq(
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // a partition is skewed past max(threshold, median * factor)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072",
    // keep the join sort-merge: a broadcast join has no skewed shuffle
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  test("OptimizeSkewedJoin splits the hot key's partition (skew=true)") {
    import spark.implicits._
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 70% of the fact lands on key 0; 64-byte padding makes the hot
      // partition's bytes dominate the median by far more than 2x
      val fact = spark.range(0, 60000)
        .select(
          when($"id" % 10 < 7, lit(0L)).otherwise($"id" % 97).as("k"),
          lpad($"id".cast("string"), 64, "x").as("pad"))
      val dim = spark.range(0, 97).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = fact.join(dim, "k")

      // collect(), not count(): count() plans a separate aggregate query,
      // leaving `joined`'s own adaptive plan unexecuted (isFinalPlan=false)
      assert(joined.collect().length === 60000)

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
