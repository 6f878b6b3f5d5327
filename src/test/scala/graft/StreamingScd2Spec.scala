package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming SCD2 change detector converges to the batch
  * ev_scd2_intervals: change points streamed over the commit-log
  * transport (with a restart between two halves of the real sf0.001
  * events — a user's attribute run can span the restart) reproduce
  * the batch history exactly once the interval ends are derived with
  * the same lead() the batch operator uses. */
class StreamingScd2Spec extends SparkSpec {

  test("streamed SCD2 change points reproduce the batch intervals across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_scd2_in").toString
    val out = Files.createTempDirectory("graft_scd2_out").toString
    val ckpt = Files.createTempDirectory("graft_scd2_ckpt").toString

    val evs = sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"))
      .as[(Long, Long, String, Long)].collect().sortBy(_._1)
    val (half1, half2) = evs.splitAt(evs.length / 2)

    def append(chunk: Array[(Long, Long, String, Long)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (id, u, t, us) =>
            (id, id.toString, s"$u|$t|$us")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select($"key".cast("long").as("event_id"), split($"value", "\\|").as("f"))
        .select($"f".getItem(0).cast("long").as("user_id"), $"event_id",
          $"f".getItem(1).as("event_type"), $"f".getItem(2).cast("long").as("us"))
        .as[(Long, Long, String, Long)]
      val q = Streams.scd2Changes(stream)
        .select(concat_ws("|", $"userId", $"version").as("key"),
          concat_ws("|", $"attr", $"validFromUs").as("value"))
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

    val changes = spark.read.format("commit-log").load(out)
      .select(split($"key", "\\|").as("k"), split($"value", "\\|").as("v"))
      .select($"k".getItem(0).cast("long").as("user_id"),
        $"k".getItem(1).cast("long").as("version"),
        $"v".getItem(0).as("attr"),
        timestamp_micros($"v".getItem(1).cast("long")).as("valid_from"))

    // no (user, version) emitted twice across the restart
    assert(changes.count() ==
      changes.select($"user_id", $"version").distinct().count())

    // derive interval ends exactly as the batch operator does
    val streamed = changes
      .withColumn("valid_to", lead($"valid_from", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"version")))
      .select($"user_id", $"version", $"attr", $"valid_from", $"valid_to")
      .as[(Long, Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet

    val batch = SparkEntry.queries("ev_scd2_intervals")(spark, sf)
      .select($"user_id", $"version", $"attr", $"valid_from", $"valid_to")
      .as[(Long, Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSet

    assert(batch.nonEmpty)
    assert(streamed == batch)
  }
}
