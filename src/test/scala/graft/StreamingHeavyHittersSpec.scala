package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming token counts over the commit-log transport converge to the
  * batch twin: the final per-token emission equals
  * `groupBy(tok).count()` over the whole corpus regardless of batch
  * slicing (counting is a commutative monoid), so the streamed
  * heavy-hitter readout (freq·50 > N) matches the exact side of
  * `sk_heavy_hitters` — verified with a restart between two halves of
  * the real sf0.001 documents table. */
class StreamingHeavyHittersSpec extends SparkSpec {

  test("streamed token counts converge to batch counts across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_hh_in").toString
    val out = Files.createTempDirectory("graft_hh_out").toString
    val ckpt = Files.createTempDirectory("graft_hh_ckpt").toString

    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val (half1, half2) = docs.splitAt(docs.length / 2)

    def append(chunk: Array[(Long, String)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p,
            part.map { case (id, text) => (id * 1000L, id.toString, text) })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select($"value".as("text"))
      val q = Streams.tokenCounts(stream)
        .select($"tok".as("key"), $"n".cast("string").as("value"))
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

    // counts only grow, so the final value per token is the max emission
    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".as("tok"), $"value".cast("long").as("n"))
      .groupBy($"tok").agg(max($"n").as("n"))
      .as[(String, Long)].collect().toMap

    val batch = sources.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toMap

    assert(streamed == batch)

    // and the derived heavy-hitter sets agree (the sk_heavy_hitters readout)
    val total = batch.values.sum
    val hhStream = streamed.filter { case (_, n) => n * 50 > total }.keySet
    val hhBatch = batch.filter { case (_, n) => n * 50 > total }.keySet
    assert(hhStream == hhBatch && hhBatch.nonEmpty)
  }
}
