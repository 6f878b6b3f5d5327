package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.operators.Dedup
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The streaming ingest loop converges to `dd_incremental`'s batch
  * formulation: incoming docs streamed over the commit-log transport,
  * admitted micro-batch by micro-batch against the persisted index
  * artifacts (fingerprints + band table + shingle arrays read back
  * from parquet — the static side of the stream-static joins), with a
  * restart between the two halves and multiple micro-batches per run
  * (admission control). Every doc's verdict must equal the batch twin
  * `admitAgainstIndex(allBatchDocs, index)` — per-doc verdicts depend
  * only on the index, so slicing/restart cannot change them.
  */
class StreamingIncrementalDedupSpec extends SparkSpec {

  test("streamed admission verdicts converge to the batch twin across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_inc_in").toString
    val out = Files.createTempDirectory("graft_inc_out").toString
    val ckpt = Files.createTempDirectory("graft_inc_ckpt").toString
    val art = Files.createTempDirectory("graft_inc_index").toString

    val docs = sources.Tables.documents(spark, sf).select($"doc_id", $"text")
    val isBatch = col("doc_id") % 5 === 0

    // build the index artifacts once and persist them — the production
    // shape: an ingest cycle reads them as static tables, it never
    // re-derives them from the raw corpus
    val built = Dedup.buildIndex(docs.filter(!isBatch))
    built.fps.write.parquet(s"$art/fps")
    built.bands.write.parquet(s"$art/bands")
    built.arrs.write.parquet(s"$art/arrs")
    val index = Dedup.DedupIndex(
      spark.read.parquet(s"$art/fps"),
      spark.read.parquet(s"$art/bands"),
      spark.read.parquet(s"$art/arrs"))

    val incoming = docs.filter(isBatch).as[(Long, String)].collect().sortBy(_._1)
    val (half1, half2) = incoming.splitAt(incoming.length / 2)

    def append(chunk: Array[(Long, String)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p,
            part.map { case (id, text) => (id * 1000L, id.toString, text) })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log")
        .option("maxRecordsPerTrigger", "20") // force several micro-batches
        .load(in)
        .select($"key".cast("long").as("doc_id"), $"value".as("text"))
      val q = Streams.incrementalAdmit(stream, index, out, ckpt)
      try q.awaitTermination(180000) finally q.stop()
    }

    append(half1)
    run()
    append(half2)
    run()

    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("doc_id"), $"value")
      .as[(Long, String)].collect()
    // exactly one verdict per doc: epoch replay would duplicate, and the
    // idempotent epoch write is what prevents that
    assert(streamed.map(_._1).distinct.length == streamed.length,
      "duplicate verdicts — epoch write was not idempotent")
    assert(streamed.length == incoming.length)

    val batchTwin = Dedup.admitAgainstIndex(docs.filter(isBatch), index)
      .select($"doc_id",
        concat_ws("|",
          $"exact_dup".cast("string"),
          coalesce($"near_dup_of".cast("string"), lit("-")),
          coalesce($"jac".cast("string"), lit("-")),
          $"keep".cast("string")).as("v"))
      .as[(Long, String)].collect().toMap
    assert(streamed.toMap == batchTwin)

    // and the admission flow actually fired on this corpus
    val kept = streamed.count(_._2.endsWith("|true"))
    assert(kept > 0 && kept < incoming.length,
      s"expected a mix of keep/reject verdicts, got $kept/${incoming.length} kept")
  }
}
