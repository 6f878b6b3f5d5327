package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import graft.streaming.Streams.AttEvent
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming last-touch attribution converges to the batch window
  * formulation (`ev_attribution` before its rollup) even when events
  * arrive out of order — each half is appended in REVERSE event order
  * and a restart separates the halves, so purchases routinely precede
  * the clicks that ultimately win them. The final emission per
  * purchase (max nEvents, monotone per user) must equal the batch
  * per-purchase assignment. */
class StreamingAttributionSpec extends SparkSpec {

  test("out-of-order streamed attribution converges to the batch window") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_att_in").toString
    val out = Files.createTempDirectory("graft_att_out").toString
    val ckpt = Files.createTempDirectory("graft_att_ckpt").toString

    val ev = sources.Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_timestamp($"ts").as("tse"), $"event_id",
        when($"event_type" === "click", 0).otherwise(1).as("kind"),
        when($"event_type" === "click",
          get_json_object($"props", "$.k").cast("long") % 4).as("ch"),
        $"value")

    val rows = ev.as[(Long, Long, Long, Int, Option[Long], Double)]
      .collect().sortBy(_._3)
    val (half1, half2) = rows.splitAt(rows.length / 2)

    def append(chunk: Array[(Long, Long, Long, Int, Option[Long], Double)]): Unit =
      // reverse order: late-arriving clicks must still win earlier purchases
      chunk.reverse.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { r =>
            (r._3, r._3.toString,
              s"${r._1}:${r._2}:${r._3}:${r._4}:${r._5.getOrElse(-99L)}:${r._6}")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select(split($"value", ":").as("f"))
        .select(
          $"f".getItem(0).cast("long").as("userId"),
          $"f".getItem(1).cast("long").as("tse"),
          $"f".getItem(2).cast("long").as("eventId"),
          $"f".getItem(3).cast("int").as("kind"),
          when($"f".getItem(4) =!= "-99", $"f".getItem(4).cast("long")).as("ch"),
          $"f".getItem(5).cast("double").as("value"))
        .as[AttEvent]
      val q = Streams.attribution(stream)
        .select($"purchaseId".cast("string").as("key"),
          concat_ws(":", $"channel", $"nEvents").as("value"))
        .writeStream.format("commit-log")
        .option("path", out).option("partitions", "2")
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

    // final answer per purchase = the emission with the largest nEvents
    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("purchaseId"),
        split($"value", ":").getItem(0).cast("long").as("channel"),
        split($"value", ":").getItem(1).cast("long").as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"purchaseId").orderBy($"n".desc)))
      .filter($"rn" === 1)
      .select($"purchaseId", $"channel")
      .as[(Long, Long)].collect().toMap

    // batch reference: the ev_attribution window carry, pre-rollup
    val w = Window.partitionBy($"user_id").orderBy($"tse", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = ev
      .withColumn("channel", coalesce(last($"ch", ignoreNulls = true).over(w), lit(-1L)))
      .filter($"kind" === 1)
      .select($"event_id", $"channel")
      .as[(Long, Long)].collect().toMap

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
