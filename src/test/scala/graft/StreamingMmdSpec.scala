package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming embedding-drift monitor converges to the batch
  * dq_mmd_drift per-(split, plane) sums: vectors streamed over the
  * commit-log transport (with a restart between two halves of the real
  * sf0.001 embeddings) produce exactly the batch sums — the row-local
  * projection leaves one commutative-monoid aggregate, so micro-batch
  * slicing can't change anything. Floats ride the log as Spark's
  * shortest-round-trip strings (cast float->string->float is exact). */
class StreamingMmdSpec extends SparkSpec {

  test("streamed MMD feature sums converge to the batch sums across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_mmd_in").toString
    val out = Files.createTempDirectory("graft_mmd_out").toString
    val ckpt = Files.createTempDirectory("graft_mmd_ckpt").toString

    val vecs = sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label",
        concat_ws(",", transform($"embedding", f => f.cast("string"))).as("es"))
      .as[(Long, Int, String)].collect().sortBy(_._1)
    val (half1, half2) = vecs.splitAt(vecs.length / 2)

    def append(chunk: Array[(Long, Int, String)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (id, lab, es) =>
            (id, id.toString, s"$lab|$es")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select($"key".cast("long").as("vec_id"), split($"value", "\\|").as("f"))
        .select($"vec_id", $"f".getItem(0).cast("int").as("label"),
          transform(split($"f".getItem(1), ","), x => x.cast("float"))
            .as("embedding"))
      val q = Streams.mmdDriftSums(stream)
        .select(concat_ws(":", $"split", $"p").as("key"),
          concat_ws("|", $"sx", $"sy", $"nx", $"ny").as("value"))
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

    // totals grow monotonically: the final emission per key is the
    // max-(nx+ny) row
    val streamed = spark.read.format("commit-log").load(out)
      .select($"key", split($"value", "\\|").as("f"))
      .select($"key",
        $"f".getItem(0).cast("long").as("sx"),
        $"f".getItem(1).cast("long").as("sy"),
        $"f".getItem(2).cast("long").as("nx"),
        $"f".getItem(3).cast("long").as("ny"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"key").orderBy(($"nx" + $"ny").desc)))
      .filter($"rn" === 1)
      .as[(String, Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    val batch = Streams.mmdDriftSums(sources.Tables.embeddings(spark, sf))
      .select(concat_ws(":", $"split", $"p").as("key"),
        $"sx".cast("long"), $"sy".cast("long"),
        $"nx".cast("long"), $"ny".cast("long"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    assert(batch.size === 96, "3 splits x 32 planes")
    assert(streamed == batch)
  }
}
