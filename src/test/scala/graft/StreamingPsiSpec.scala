package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming drift monitor converges to the batch ev_psi bins:
  * per-bin pre/post purchase counts streamed over the commit-log
  * transport (with a restart between two halves of the real sf0.001
  * events) equal the batch bins exactly — integer counts are a
  * commutative monoid, so micro-batch slicing can't change them. */
class StreamingPsiSpec extends SparkSpec {

  test("streamed PSI bins converge to the batch bins across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_psi_in").toString
    val out = Files.createTempDirectory("graft_psi_out").toString
    val ckpt = Files.createTempDirectory("graft_psi_ckpt").toString

    val evs = sources.Tables.events(spark, sf)
      .select($"event_id", $"event_type", $"value", unix_micros($"ts").as("us"))
      .as[(Long, String, Double, Long)].collect().sortBy(_._1)
    val (half1, half2) = evs.splitAt(evs.length / 2)

    def append(chunk: Array[(Long, String, Double, Long)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (id, t, v, us) =>
            (id, id.toString, s"$t|$v|$us")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select(split($"value", "\\|").as("f"))
        .select($"f".getItem(0).as("event_type"),
          $"f".getItem(1).cast("double").as("value"),
          timestamp_micros($"f".getItem(2).cast("long")).as("ts"))
      val q = Streams.psiBins(stream)
        .select($"bin".cast("string").as("key"),
          concat_ws("|", $"n", $"n_pre", $"n_post").as("value"))
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

    // n grows monotonically: the final emission per bin is the max-n row
    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("bin"), split($"value", "\\|").as("f"))
      .select($"bin", $"f".getItem(0).cast("long").as("n"),
        $"f".getItem(1).cast("long").as("n_pre"),
        $"f".getItem(2).cast("long").as("n_post"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"bin").orderBy($"n".desc)))
      .filter($"rn" === 1)
      .select($"bin", $"n_pre", $"n_post")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val batch = Streams.psiBins(sources.Tables.events(spark, sf))
      .select($"bin", $"n_pre".cast("long"), $"n_post".cast("long"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(batch.nonEmpty)
    assert(streamed == batch)
  }
}
