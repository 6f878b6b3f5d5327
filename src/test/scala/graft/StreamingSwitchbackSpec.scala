package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming switchback monitor converges to the batch
  * ev_switchback arms: per hour-parity arm counters streamed over the
  * commit-log transport (with a restart between two halves of the
  * real sf0.001 events) equal the batch aggregation exactly — counts
  * and DECIMAL value sums are commutative monoids, so micro-batch
  * slicing and the checkpointed restart can't move them. */
class StreamingSwitchbackSpec extends SparkSpec {

  test("streamed switchback arms converge to the batch counters across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_swb_in").toString
    val out = Files.createTempDirectory("graft_swb_out").toString
    val ckpt = Files.createTempDirectory("graft_swb_ckpt").toString

    val evs = sources.Tables.events(spark, sf)
      .select($"event_id", expr("unix_micros(ts)"), $"value")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val (half1, half2) = evs.splitAt(evs.length / 2)

    def append(chunk: Array[(Long, Long, Double)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (id, us, v) =>
            (id, id.toString, s"$us|$v")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select(split($"value", "\\|").as("f"))
        .select(expr("timestamp_micros(CAST(f[0] AS LONG))").as("ts"),
          $"f".getItem(1).cast("double").as("value"))
      val q = Streams.switchbackMoments(stream)
        .select($"arm".cast("string").as("key"),
          concat_ws("|", $"n_all", $"s_all", $"n_core", $"s_core").as("value"))
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

    // n_all grows monotonically: the final emission per arm is max-n
    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("arm"), split($"value", "\\|").as("f"))
      .select($"arm", $"f".getItem(0).cast("long").as("n_all"),
        $"f".getItem(1).as("s_all"),
        $"f".getItem(2).cast("long").as("n_core"),
        $"f".getItem(3).as("s_core"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"arm").orderBy($"n_all".desc)))
      .filter($"rn" === 1)
      .select($"arm", $"n_all", $"s_all", $"n_core", $"s_core")
      .as[(Long, Long, String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, BigDecimal(r._3), r._4, BigDecimal(r._5))))
      .toMap

    val batch = Streams.switchbackMoments(sources.Tables.events(spark, sf))
      .select($"arm", $"n_all", $"s_all".cast("string"),
        $"n_core", $"s_core".cast("string"))
      .as[(Long, Long, String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, BigDecimal(r._3), r._4, BigDecimal(r._5))))
      .toMap

    assert(streamed.keySet == batch.keySet)
    assert(streamed.keySet == Set(0L, 1L))
    for (arm <- batch.keySet) {
      assert(streamed(arm) == batch(arm),
        s"arm $arm: streamed=${streamed(arm)} batch=${batch(arm)}")
    }
  }
}
