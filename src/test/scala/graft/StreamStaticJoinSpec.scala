package graft

import java.nio.file.Files

import graft.io.CommitLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream–static enrichment join — the third join mode next to the
  * stateful stream–stream interval join (StreamStreamJoinSpec) and the
  * batch surface: every micro-batch joins against a STATIC dimension
  * (here a per-user profile precomputed from history), which Spark
  * plans stateless — typically broadcast, no watermark, no join state.
  * The enriched stream must equal the batch join over the same data. */
class StreamStaticJoinSpec extends SparkSpec {

  test("micro-batch enrichment against a static dimension equals the batch join") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ssx_in").toString
    val out = Files.createTempDirectory("graft_ssx_out").toString
    val ckpt = Files.createTempDirectory("graft_ssx_ckpt").toString

    val ev = sources.Tables.events(spark, sf)

    // static side: per-user historical profile (count + lifetime value)
    val profile = ev.groupBy($"user_id")
      .agg(count(lit(1)).as("n_hist"), graft.det.dsum($"value").as("ltv"))

    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)

    purchases.grouped(math.max(purchases.length / 3, 1)).zipWithIndex.foreach {
      case (part, p) =>
        CommitLog.append(in, p % 2,
          part.map(r => (r._1, r._1.toString, s"${r._2}:${r._3}")))
    }

    val stream = spark.readStream.format("commit-log").load(in)
      .select($"key".cast("long").as("event_id"),
        split($"value", ":").getItem(0).cast("long").as("user_id"),
        split($"value", ":").getItem(1).cast("double").as("value"))
    val q = stream.join(broadcast(profile), "user_id")
      .select($"event_id".cast("string").as("key"),
        concat_ws(":", $"user_id", $"n_hist", $"ltv").as("value"))
      .writeStream.format("commit-log")
      .option("path", out).option("partitions", "2")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()

    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("event_id"), $"value")
      .as[(Long, String)].collect().toMap

    val batch = ev.filter($"event_type" === "purchase")
      .join(profile, "user_id")
      .select($"event_id",
        concat_ws(":", $"user_id", $"n_hist", $"ltv").as("value"))
      .as[(Long, String)].collect().toMap

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
