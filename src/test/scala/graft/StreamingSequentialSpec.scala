package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The streaming group-sequential monitor converges to the batch
  * `ev_sequential_test` table: events streamed over the commit-log
  * transport in several micro-batches with a restart between the two
  * halves; the last epoch's published table must equal the batch
  * query row-for-row (state is a per-user min-fold, so slicing and
  * replay cannot move it).
  */
class StreamingSequentialSpec extends SparkSpec {

  test("streamed sequential monitor converges to the batch table") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_seq_in").toString
    val out = Files.createTempDirectory("graft_seq_out").toString
    val ckpt = Files.createTempDirectory("graft_seq_ckpt").toString

    val rows = sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        expr("(unix_micros(ts) - 1704067200000000) DIV 86400000000").as("day"),
        ($"event_type" === "purchase").as("purchase"))
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val (half1, half2) = rows.splitAt(rows.length / 2)

    def append(chunk: Array[(Long, Long, Long, Boolean)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (eid, uid, day, pur) =>
            (eid, eid.toString, s"$uid|$day|$pur")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log")
        .option("maxRecordsPerTrigger", "2000")
        .load(in)
        .select(split($"value", "\\|").as("f"))
        .select($"f".getItem(0).cast("long").as("user_id"),
          $"f".getItem(1).cast("long").as("day"),
          ($"f".getItem(2) === "true").as("purchase"))
      val q = Streams.sequentialMonitor(stream, out, ckpt)
      try q.awaitTermination(180000) finally q.stop()
    }

    append(half1)
    run()
    append(half2)
    run()

    val log = spark.read.format("commit-log").load(s"$out/log")
      .select($"ts".cast("long").as("epoch"), $"key", $"value")
      .as[(Long, String, String)].collect()
    assert(log.nonEmpty)
    val lastEpoch = log.map(_._1).max
    val streamed = log.filter(_._1 == lastEpoch)
      .map(r => r._2 -> r._3).toMap
    assert(streamed.size == 5)

    val batch = SparkEntry.queries("ev_sequential_test")(spark, sf)
      .select($"look".cast("string").as("k"),
        concat_ws("|", $"day", $"n_a", $"n_b", $"conv_a", $"conv_b",
          coalesce($"z".cast("string"), lit("-")),
          $"boundary",
          coalesce($"crossed".cast("string"), lit("-"))).as("v"))
      .as[(String, String)].collect().toMap
    assert(streamed == batch,
      s"streamed=$streamed\nbatch=$batch")

    // an intermediate epoch existed and differed (the monitor actually
    // updated across batches, not just once at the end)
    assert(log.map(_._1).distinct.length > 1,
      "expected more than one published epoch")
  }
}
