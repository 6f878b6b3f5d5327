package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** `dropDuplicatesWithinWatermark` is the bounded-state streaming
  * dedup: state per key lives only until the watermark passes
  * first-seen-ts + delay. This pins BOTH halves of that contract over
  * the commit-log transport with a checkpointed restart between
  * batches:
  *   - a duplicate arriving within the delay of its first sighting is
  *     suppressed, and
  *   - a duplicate arriving after its key's state expired is
  *     re-emitted (the price of never growing state without bound —
  *     plain dropDuplicates would suppress it forever and OOM the
  *     state store at ingest scale).
  */
class StreamingWithinWatermarkSpec extends SparkSpec {

  test("suppression inside the delay, re-emission after state expiry") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ww_in").toString
    val out = Files.createTempDirectory("graft_ww_out").toString
    val ckpt = Files.createTempDirectory("graft_ww_ckpt").toString

    def append(rows: Seq[(Long, String)]): Unit =
      CommitLog.append(in, 0, rows.map { case (sec, k) => (sec * 1000000L, k, "v") })

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select($"ts", $"key".as("k"))
      val q = Streams.dedupWithinWatermark(stream, "5 seconds")
        .select($"k".as("key"), $"ts".cast("long").cast("string").as("value"))
        .writeStream.format("commit-log")
        .option("path", out).option("partitions", "1")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }

    // all event times sit strictly above epoch 0: a row AT the initial
    // watermark (ts = 0) is filtered as late before dedup ever sees it
    // batch 1: k1@10s, k2@30s → watermark after the batch = 30s - 5s = 25s,
    // which is past k1's state expiry (10s + 5s) but not k2's (35s)
    append(Seq(10L -> "k1", 30L -> "k2"))
    run()
    // batch 2 (restart): k1@26s is above the watermark and its state
    // expired → re-emitted; k2@31s is within k2's delay → suppressed;
    // k3 is new → emitted
    append(Seq(26L -> "k1", 31L -> "k2", 32L -> "k3"))
    run()

    val emitted = spark.read.format("commit-log").load(out)
      .select($"key", $"value".cast("long").as("sec"))
      .as[(String, Long)].collect().toSeq.sorted
    assert(emitted == Seq("k1" -> 10L, "k1" -> 26L, "k2" -> 30L, "k3" -> 32L),
      s"got $emitted")
  }
}
