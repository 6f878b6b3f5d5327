package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.operators.IntervalJoin
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The streaming concurrency monitor converges to the batch
  * `jx_interval_overlap` formulation: events streamed over the
  * commit-log transport in several micro-batches with a mid-stream
  * RESTART, per-user session state re-derives each touched user's
  * sessions, and every epoch publishes the hour-cell overlap counts of
  * the merged snapshot with ts = epochId. The max-ts rows of the log —
  * the converged readout — must equal
  * `overlapCounts(sessionIntervals(allEvents))` exactly.
  */
class StreamingConcurrencySpec extends SparkSpec {

  test("monitor readout converges to the batch interval-overlap across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_conc_in").toString
    val out = Files.createTempDirectory("graft_conc_out").toString
    val ckpt = Files.createTempDirectory("graft_conc_ckpt").toString

    val ev = sources.Tables.events(spark, sf)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("t"))
    val rows = ev.as[(Long, Long, Long)].collect().sortBy(_._2)
    val (half1, half2) = rows.splitAt(rows.length / 2)

    def append(chunk: Array[(Long, Long, Long)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (u, eid, t) =>
            (t * 1000000L, eid.toString, s"$u|$t")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log")
        .option("maxRecordsPerTrigger", (rows.length / 4).max(1).toString)
        .load(in)
        .select($"key".cast("long").as("eventId"), $"value")
        .select($"eventId",
          split($"value", "\\|").getItem(0).cast("long").as("userId"),
          split($"value", "\\|").getItem(1).cast("long").as("t"))
        .select($"userId", $"eventId", $"t")
        .as[Streams.SessEvent]
      val q = Streams.concurrencyMonitor(stream, out, ckpt)
      try q.awaitTermination(180000) finally q.stop()
    }

    append(half1)
    run()
    append(half2)
    run()

    val log = spark.read.format("commit-log").load(s"$out/log")
      .select($"ts".cast("long").as("epoch"), $"key", $"value")
    val lastEpoch = log.agg(max($"epoch")).as[Long].head()
    val streamed = log.filter($"epoch" === lastEpoch)
      .select($"key", $"value").as[(String, String)].collect().toMap

    val batch = IntervalJoin.overlapCounts(IntervalJoin.sessionIntervals(
        sources.Tables.events(spark, sf)))
      .select(
        concat_ws("|", $"user_id", $"session_no").as("k"),
        concat_ws("|", $"session_start", $"session_end", $"n_overlaps").as("v"))
      .as[(String, String)].collect().toMap

    assert(streamed.size == batch.size,
      s"session count mismatch: streamed ${streamed.size} vs batch ${batch.size}")
    assert(streamed == batch)
    // the monitor actually observed concurrency on this corpus
    // snapshot GC: storage must stay bounded (current epoch + its
    // predecessor at most) — without pruning, every epoch's full
    // snapshot would accumulate for the life of the monitor
    val snaps = new java.io.File(s"$out/snapshot").list()
      .count(_.startsWith("epoch="))
    assert(snaps <= 2, s"expected <= 2 retained snapshots, found $snaps")
    assert(batch.values.exists(!_.endsWith("|0")),
      "expected at least one overlapping session pair")
  }
}
