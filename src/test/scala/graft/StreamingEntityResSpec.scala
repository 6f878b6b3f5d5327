package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.operators.EntityRes
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The streaming ER admission loop converges to `er_incremental`'s
  * batch formulation: arriving customer records streamed over the
  * commit-log transport, matched micro-batch by micro-batch against
  * the persisted name-registry index (position-tagged deletion
  * variants + blocking attributes, read back from parquet), with a
  * restart between the two halves and several micro-batches per run.
  * Every record's verdict must equal the batch twin
  * `admitAgainstRegistry(allBatchRecords, registry)` — verdicts depend
  * only on the index, so slicing/restart cannot change them.
  */
class StreamingEntityResSpec extends SparkSpec {

  test("streamed ER admission converges to the batch twin across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_er_in").toString
    val out = Files.createTempDirectory("graft_er_out").toString
    val ckpt = Files.createTempDirectory("graft_er_ckpt").toString
    val art = Files.createTempDirectory("graft_er_index").toString

    val cust = sources.Tables.customer(spark, sf)
      .select($"c_custkey", $"c_name", $"c_nationkey", $"c_mktsegment")
    val isBatch = col("c_custkey") % 5 === 0

    // build + persist the registry index once; ingest cycles read it
    // back as a static table (never re-derive from the raw register)
    EntityRes.buildNameRegistry(cust.filter(!isBatch))
      .write.parquet(s"$art/registry")
    val registry = spark.read.parquet(s"$art/registry")

    val incoming = cust.filter(isBatch)
      .as[(Long, String, Long, String)].collect().sortBy(_._1)
    val (half1, half2) = incoming.splitAt(incoming.length / 2)

    def append(chunk: Array[(Long, String, Long, String)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (id, name, nat, seg) =>
            (id * 1000L, id.toString, s"$name|$nat|$seg")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log")
        .option("maxRecordsPerTrigger", "10") // force several micro-batches
        .load(in)
        .select($"key".cast("long").as("c_custkey"),
          split($"value", "\\|").as("f"))
        .select($"c_custkey", $"f".getItem(0).as("c_name"),
          $"f".getItem(1).cast("long").as("c_nationkey"),
          $"f".getItem(2).as("c_mktsegment"))
      val q = Streams.erAdmit(stream, registry, out, ckpt)
      try q.awaitTermination(180000) finally q.stop()
    }

    append(half1)
    run()
    append(half2)
    run()

    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("c_custkey"), $"value")
      .as[(Long, String)].collect()
    assert(streamed.map(_._1).distinct.length == streamed.length,
      "duplicate verdicts — epoch write was not idempotent")
    assert(streamed.length == incoming.length)

    val batchTwin = EntityRes.admitAgainstRegistry(
        cust.filter(isBatch), registry)
      .select($"c_custkey",
        concat_ws("|",
          $"n_matches".cast("string"),
          coalesce($"best_match".cast("string"), lit("-")),
          $"is_new".cast("string")).as("v"))
      .as[(Long, String)].collect().toMap
    assert(streamed.toMap == batchTwin)

    // the register actually resolves entities on this fixture: some
    // arrivals match a registered near-identical name, some are new
    val matched = streamed.count(!_._2.endsWith("|true"))
    assert(matched > 0 && matched < incoming.length,
      s"expected a mix of matched/new verdicts, got $matched/${incoming.length} matched")
  }
}
