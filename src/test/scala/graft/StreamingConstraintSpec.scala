package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.operators.ConstraintMining
import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** The streaming constraint monitor converges to the batch validation:
  * odd-day (serving) events streamed over the commit-log transport,
  * scored micro-batch by micro-batch against the PERSISTED learned
  * bounds (trained on even days and read back as a static table), with
  * a restart between the two halves. Every record's verdict must equal
  * the batch join against the same bounds — verdicts depend only on
  * the bounds artifact, so slicing/restart cannot change them.
  */
class StreamingConstraintSpec extends SparkSpec {

  test("streamed constraint verdicts converge to the batch validation across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_cm_in").toString
    val out = Files.createTempDirectory("graft_cm_out").toString
    val ckpt = Files.createTempDirectory("graft_cm_ckpt").toString
    val art = Files.createTempDirectory("graft_cm_bounds").toString

    val ev = ConstraintMining.withDayIndex(sources.Tables.events(spark, sf))
      .localCheckpoint()
    ConstraintMining.learnedBounds(ev).write.parquet(s"$art/bounds")
    val learned = spark.read.parquet(s"$art/bounds")

    // serving split, with one planted record of an unseen type — the
    // monitor must label it rather than silently pass or drop it
    val serving = ev.filter($"di" % 2 === 1)
      .select($"event_id", $"event_type", $"v".cast("string").as("vs"))
      .as[(Long, String, String)].collect().sortBy(_._1) :+
      ((-1L, "never_seen_type", "123.45"))
    val (half1, half2) = serving.splitAt(serving.length / 2)

    def append(chunk: Array[(Long, String, String)], runNo: Int): Unit =
      chunk.grouped(math.max(chunk.length / 3, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p % 2, part.map { case (id, t, v) =>
            (runNo * 1000000L + id + 500000L, id.toString, s"$t|$v")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log")
        .option("maxRecordsPerTrigger", "200")
        .load(in)
        .select($"key".cast("long").as("event_id"),
          split($"value", "\\|").as("f"))
        .select($"event_id", $"f".getItem(0).as("event_type"),
          $"f".getItem(1).cast("decimal(18,2)").as("v"))
      val q = Streams.constraintMonitor(stream, learned, out, ckpt)
      try q.awaitTermination(180000) finally q.stop()
    }

    append(half1, 1)
    run()
    append(half2, 2)
    run()

    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long"), $"value".cast("string"))
      .as[(Long, String)].collect()
    assert(streamed.map(_._1).distinct.length == streamed.length,
      "duplicate verdicts — epoch write was not idempotent")
    assert(streamed.length == serving.length)

    // batch twin: the same join against the same bounds
    val servingDf = serving.toSeq.toDF("event_id", "event_type", "vs")
      .select($"event_id", $"event_type", $"vs".cast("decimal(18,2)").as("v"))
    val twin = servingDf.join(learned, Seq("event_type"), "left")
      .select($"event_id",
        concat_ws("|", $"event_type",
          when($"lo".isNull, lit("unknown_type"))
            .when($"v" < $"lo" || $"v" > $"hi", lit("violation"))
            .otherwise(lit("ok"))).as("verdict"))
      .as[(Long, String)].collect().toMap
    assert(streamed.toMap == twin)

    // the fixture exercises all three verdict classes
    val kinds = streamed.map(_._2.split('|').last).toSet
    assert(kinds.contains("ok"))
    assert(kinds.contains("unknown_type"), "planted unseen type must surface")
    assert(kinds.contains("violation"), "planted out-of-bounds value must surface")
  }
}
