package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** End-to-end queue pipeline: commit-log source → stateful operator →
  * commit-log sink, with a restart in the middle. This is the §2.9
  * streaming lifecycle over the engine's own message-queue transport —
  * records survive the restart exactly once and the downstream log is
  * readable as a batch table. */
class CommitLogPipelineSpec extends SparkSpec {

  test("queue -> bounded log state -> queue round trip survives a restart exactly-once") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_pipe_in").toString
    val out = Files.createTempDirectory("graft_pipe_out").toString
    val ckpt = Files.createTempDirectory("graft_pipe_ckpt").toString

    def run(): Unit = {
      val records = spark.readStream.format("commit-log").load(in)
        .select($"key".as("sessionId"), $"ts", $"value".as("content"))
        .as[graft.model.MemoryRecord]
      val counts = Streams.boundedLogAppend(records, cap = 100)
      val q = counts
        .select($"sessionId".as("key"), $"kept".cast("string").as("value"))
        .writeStream.format("commit-log")
        .option("path", out).option("partitions", "2")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }

    def micros(s: Long) = s * 1000000L
    CommitLog.append(in, 0, (1 to 3).map(i => (micros(i), "sess-a", s"r$i")))
    run()
    // restart with more input: state (3 records for sess-a) must carry
    // over, input offsets must resume, output must not duplicate
    CommitLog.append(in, 0, (4 to 5).map(i => (micros(i), "sess-a", s"r$i")))
    CommitLog.append(in, 1, Seq((micros(9), "sess-b", "r9")))
    run()

    val outDf = spark.read.format("commit-log").load(out)
      .select($"key", $"value".cast("long").as("kept"))
    // latest emitted count per session = total records ever appended
    val lastKept = outDf.groupBy($"key").agg(max($"kept").as("kept"))
      .as[(String, Long)].collect().toMap
    assert(lastKept == Map("sess-a" -> 5L, "sess-b" -> 1L), s"got $lastKept")
    // exactly-once: one emission per (session, micro-batch with data);
    // sess-a appears in both runs' batches, never duplicated
    val aEmissions = outDf.filter($"key" === "sess-a").collect()
    assert(aEmissions.length == 2, s"expected 2 emissions, got ${aEmissions.length}")
  }

  test("memory-update state operator runs over the queue transport") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_pipe_mem").toString
    // analysis events as queue messages: value = "summary|topic"
    CommitLog.append(in, 0, Seq(
      (1000000L, "s1", "sum1|alpha"),
      (2000000L, "s1", "sum2|beta"),
      (3000000L, "s2", "sumX|gamma")))

    val analyses = spark.readStream.format("commit-log").load(in)
      .select($"key".as("sessionId"), $"ts",
        split($"value", "\\|").getItem(0).as("summary"),
        array(split($"value", "\\|").getItem(1)).as("topicNames"),
        array(lit("d")).as("topicDescriptions"),
        array().cast("array<string>").as("keyFacts"))
      .as[Streams.AnalysisEvent]
    val q = Streams.memoryUpdates(analyses)
      .writeStream.format("memory").queryName("pipe_mem")
      .outputMode(OutputMode.Update).start()
    try q.processAllAvailable() finally q.stop()

    val snaps = spark.table("pipe_mem").as[Streams.MemorySnapshot].collect()
    val s1Last = snaps.filter(_.sessionId == "s1").maxBy(_.ts.getTime)
    assert(s1Last.latestSummary == "sum2")
    assert(s1Last.topicNames.toSet == Set("alpha", "beta"))
    val s2Last = snaps.filter(_.sessionId == "s2").maxBy(_.ts.getTime)
    assert(s2Last.topicNames.toSet == Set("gamma"))
  }
}
