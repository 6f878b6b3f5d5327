package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming KMV sketch converges to the batch order statistic:
  * the k smallest distinct user-id hashes per event type streamed
  * over the commit-log transport (with a restart between two halves
  * of the real sf0.001 events) end at exactly the batch k-th minimum
  * — bottom-k-of-a-set is an idempotent commutative merge, so batch
  * slicing, replay, and the checkpointed restart cannot move it. */
class StreamingKmvSpec extends SparkSpec {

  private val k = 16

  test("streamed KMV minima converge to the batch k-th minimum across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_kmv_in").toString
    val out = Files.createTempDirectory("graft_kmv_out").toString
    val ckpt = Files.createTempDirectory("graft_kmv_ckpt").toString

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
      val q = Streams.kmvMinima(stream, k)
        .select($"key",
          concat_ws("|", $"kth", $"nKept").as("value"))
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

    // the k-th minimum shrinks monotonically; the final emission per
    // key is the last row written for it (max offset in the topic)
    val streamed = spark.read.format("commit-log").load(out)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"key").orderBy($"offset".desc)))
      .filter($"rn" === 1)
      .select($"key", split($"value", "\\|").as("f"))
      .select($"key", $"f".getItem(0).cast("long").as("kth"),
        $"f".getItem(1).cast("int").as("nKept"))
      .as[(String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val batch = sources.Tables.events(spark, sf)
      .select($"event_type",
        graft.functions.PortableHash.h32($"user_id".cast("string")).as("hv"))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"hv")))
      .filter($"rn" <= k)
      .groupBy($"event_type")
      .agg(max($"hv").as("kth"), count(lit(1)).cast("int").as("n"))
      .as[(String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(streamed.keySet == batch.keySet)
    for (key <- batch.keySet)
      assert(streamed(key) == batch(key),
        s"$key: streamed=${streamed(key)} batch=${batch(key)}")
  }
}
