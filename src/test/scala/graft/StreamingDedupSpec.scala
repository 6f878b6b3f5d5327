package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.operators.Dedup
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming MinHash dedup over the commit-log transport converges to
  * the batch formulation: the final per-signature emission equals
  * `groupBy(sig).agg(min(doc_id), count(*))` over the whole corpus,
  * independent of batch slicing — verified with a restart between two
  * halves of the real sf0.001 documents table. */
class StreamingDedupSpec extends SparkSpec {

  test("streamed signature groups converge to the batch twin across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_dd_in").toString
    val out = Files.createTempDirectory("graft_dd_out").toString
    val ckpt = Files.createTempDirectory("graft_dd_ckpt").toString

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
        .select($"key".cast("long").as("doc_id"), $"value".as("text"))
      val q = Streams.minhashDedup(stream)
        .select($"sig".as("key"),
          concat_ws(":", $"canonicalId", $"nDocs").as("value"))
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

    // monotone updates: the final value per sig is (min canonical, max n)
    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".as("sig"),
        split($"value", ":").getItem(0).cast("long").as("canonicalId"),
        split($"value", ":").getItem(1).cast("long").as("nDocs"))
      .groupBy($"sig")
      .agg(min($"canonicalId").as("canonicalId"), max($"nDocs").as("nDocs"))
      .as[(String, Long, Long)].collect()
      .map { case (s, c, n) => s -> ((c, n)) }.toMap

    val sigCols = (0 until 8).map(i => col(s"mh$i"))
    val batch = Dedup.minhashSignatures(Dedup.shingles(sources.Tables.documents(spark, sf)))
      .select(concat_ws("_", sigCols: _*).as("sig"), col("doc_id"))
      .groupBy($"sig")
      .agg(min($"doc_id").as("canonicalId"), count(lit(1)).as("nDocs"))
      .as[(String, Long, Long)].collect()
      .map { case (s, c, n) => s -> ((c, n)) }.toMap

    assert(streamed.size == batch.size,
      s"distinct signatures: streamed ${streamed.size} vs batch ${batch.size}")
    assert(streamed == batch)
    // and the dedup actually found duplicates on this corpus
    assert(batch.values.exists(_._2 > 1), "expected at least one duplicate group")
  }
}
