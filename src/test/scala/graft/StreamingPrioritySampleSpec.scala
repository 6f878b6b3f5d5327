package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming weighted priority sampling over the commit-log transport
  * converges to the batch `pl_priority_sample` selection: priorities
  * q = w / u are row-local (hash-deterministic uniforms), so the
  * stream reduces to maintaining the top-k priorities in bounded
  * state — [[Streams.topKPerKey]] with one logical key and k-sized
  * state, replayable across a restart. The final emitted id set must
  * equal the batch query's sample on the same corpus, independent of
  * how the stream was sliced into batches. */
class StreamingPrioritySampleSpec extends SparkSpec {

  test("streamed top-k priorities equal the batch sample across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ps_in").toString
    val out = Files.createTempDirectory("graft_ps_out").toString
    val ckpt = Files.createTempDirectory("graft_ps_ckpt").toString

    val docs = sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val (half1, half2) = docs.splitAt(docs.length / 2)

    def append(chunk: Array[(Long, String)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p,
            part.map { case (id, text) => (id * 1000L, id.toString, text) })
      }

    val k = 20

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select($"key".cast("long").as("doc_id"), $"value".as("text"))
        // identical priority formula to pl_priority_sample
        .select(lit("sample").as("g"), $"doc_id",
          (size(split($"text", " ")).cast("long")
            / ((graft.functions.PortableHash.h32($"doc_id".cast("string")) + 1)
              / lit(4294967296.0))).as("q"))
        .as[(String, Long, Double)]
      val q = Streams.topKPerKey(stream, k)
        .select($"id".cast("string").as("key"),
          concat_ws(":", $"rank", $"score").as("value"))
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

    // A doc can appear in early emissions and be displaced later: the
    // FINAL state is the last full top-k emission, i.e. the k ids with
    // the highest priorities ever emitted (priorities are static per
    // doc, so re-aggregating emissions by max priority and taking the
    // top k reconstructs the final state exactly).
    val streamedTop = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("doc_id"),
        split($"value", ":").getItem(1).cast("double").as("q"))
      .groupBy($"doc_id").agg(max($"q").as("q"))
      .orderBy($"q".desc, $"doc_id").limit(k)
      .select($"doc_id").as[Long].collect().toSet

    val batchTop = sources.Tables.documents(spark, sf)
      .select($"doc_id",
        (size(split($"text", " ")).cast("long")
          / ((graft.functions.PortableHash.h32($"doc_id".cast("string")) + 1)
            / lit(4294967296.0))).as("q"))
      .orderBy($"q".desc, $"doc_id").limit(k)
      .select($"doc_id").as[Long].collect().toSet

    assert(streamedTop == batchTop,
      s"streamed sample diverged: ${streamedTop.diff(batchTop)} vs ${batchTop.diff(streamedTop)}")
  }
}
