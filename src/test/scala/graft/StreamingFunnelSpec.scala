package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The streaming funnel tracker converges to the batch `ev_funnel`
  * chained-minimum counts: funnel events streamed over the commit-log
  * transport in several micro-batches with a mid-stream RESTART and a
  * deliberately SHUFFLED arrival order (out-of-order views must
  * retroactively re-qualify clicks), per-user state re-derives the
  * stage times, and the last emission per user (max n_events)
  * aggregates to exactly the batch stage counts.
  */
class StreamingFunnelSpec extends SparkSpec {

  test("streamed funnel stages converge to batch ev_funnel across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_fun_in").toString
    val ckpt = Files.createTempDirectory("graft_fun_ckpt").toString

    val kinds = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
    val rows = sources.Tables.events(spark, sf)
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", unix_timestamp($"ts").as("tse"), $"event_type")
      .as[(Long, Long, String)].collect()
      .map { case (u, t, k) => (u, t, kinds(k)) }
    // deterministic shuffle: order by a hash so stages arrive out of
    // chronological order (the retroactive-requalification case)
    val shuffled = rows.sortBy { case (u, t, k) => ((u * 31 + t * 7 + k) % 1009, t, k) }
    val (half1, half2) = shuffled.splitAt(shuffled.length / 2)

    def append(chunk: Array[(Long, Long, Int)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.zipWithIndex.map { case ((u, t, k), i) =>
            (t * 1000000L, s"$u-$p-$i", s"$u|$t|$k")
          })
      }

    val results = new java.util.concurrent.ConcurrentHashMap[Long, (Option[Long], Option[Long], Option[Long], Long)]()
    def run(): Unit = {
      val stream = spark.readStream.format("commit-log")
        .option("maxRecordsPerTrigger", (rows.length / 4).max(1).toString)
        .load(in)
        .select(split($"value", "\\|").getItem(0).cast("long").as("userId"),
          split($"value", "\\|").getItem(1).cast("long").as("tse"),
          split($"value", "\\|").getItem(2).cast("int").as("kind"))
        .as[Streams.FunnelEvent]
      val q = Streams.funnelStages(stream).writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streams.FunnelEmit], _: Long) =>
          batch.collect().foreach { e =>
            results.merge(e.user_id, (e.v_ts, e.c_ts, e.p_ts, e.n_events),
              (a, b) => if (a._4 >= b._4) a else b)
          }
        }
        .start()
      try q.awaitTermination(180000) finally q.stop()
    }

    append(half1)
    run()
    append(half2)
    run()

    import scala.jdk.CollectionConverters._
    val last = results.asScala
    val streamedCounts = Map(
      "1_view" -> last.values.count(_._1.isDefined).toLong,
      "2_click" -> last.values.count(_._2.isDefined).toLong,
      "3_purchase" -> last.values.count(_._3.isDefined).toLong)

    val batch = SparkEntry.queries("ev_funnel")(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(streamedCounts == batch,
      s"streamed $streamedCounts vs batch $batch")
    // the retroactive case is actually exercised: some user must have
    // a click qualified by a view that arrived after it in stream order
    assert(batch("2_click") > 0)
  }
}
