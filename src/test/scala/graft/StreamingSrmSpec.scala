package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming assignment monitor converges to the batch ev_srm
  * arms: first-exposure emissions streamed over the commit-log
  * transport (with a restart between two halves of the real sf0.001
  * events) form exactly the distinct (surface, user) set, so the arm
  * counts derived from the topic equal the batch query's — and the
  * checkpointed first-seen state means the replayed half emits no
  * pair twice. */
class StreamingSrmSpec extends SparkSpec {

  test("streamed first exposures reproduce the batch SRM arms across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_srm_in").toString
    val out = Files.createTempDirectory("graft_srm_out").toString
    val ckpt = Files.createTempDirectory("graft_srm_ckpt").toString

    val evs = sources.Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"user_id")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val (half1, half2) = evs.splitAt(evs.length / 2)

    def append(chunk: Array[(Long, String, Long)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (id, t, u) =>
            (id, id.toString, s"$t|$u")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select(split($"value", "\\|").as("f"))
        .select($"f".getItem(0).as("event_type"),
          $"f".getItem(1).cast("long").as("user_id"))
      val q = Streams.firstExposures(stream)
        .select(concat_ws("|", $"eventType", $"userId").as("key"),
          lit("1").as("value"))
        .writeStream.format("commit-log")
        .option("path", out).option("partitions", "1")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }

    append(half1)
    run()
    append(half2)
    run()

    val emitted = spark.read.format("commit-log").load(out)
      .select(split($"key", "\\|").as("f"))
      .select($"f".getItem(0).as("event_type"), $"f".getItem(1).cast("long").as("user_id"))

    // no pair emitted twice, even though half2's run replays state
    assert(emitted.count() == emitted.distinct().count())

    val streamedArms = emitted
      .groupBy($"event_type")
      .agg(sum(when($"user_id" % 2 === 0, 1).otherwise(0)).as("n_a"),
        sum(when($"user_id" % 2 === 1, 1).otherwise(0)).as("n_b"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val batch = SparkEntry.queries("ev_srm")(spark, sf)
      .select($"event_type", $"n_a", $"n_b")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(batch.nonEmpty)
    assert(streamedArms == batch)
  }
}
