package graft

import java.nio.file.Files

import graft.io.CommitLog
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming experiment monitor converges to the batch ev_ab_test:
  * per-variant purchase-value moments streamed over the commit-log
  * transport (with a restart between two halves of the real sf0.001
  * events) equal the batch moments exactly — decimal sums are a
  * commutative monoid, so batch slicing can't change the result — and
  * the derived Welch t matches bit-for-bit. */
class StreamingAbTestSpec extends SparkSpec {

  test("streamed A/B moments converge to the batch statistic across a restart") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ab_in").toString
    val out = Files.createTempDirectory("graft_ab_out").toString
    val ckpt = Files.createTempDirectory("graft_ab_ckpt").toString

    val evs = sources.Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
    val (half1, half2) = evs.splitAt(evs.length / 2)

    def append(chunk: Array[(Long, Long, String, Double)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { case (id, u, t, v) =>
            // Double.toString is the shortest round-tripping repr —
            // the parse below recovers the identical bits
            (id, id.toString, s"$u|$t|$v")
          })
      }

    def run(): Unit = {
      val stream = spark.readStream.format("commit-log").load(in)
        .select(split($"value", "\\|").as("f"))
        .select($"f".getItem(0).cast("long").as("user_id"),
          $"f".getItem(1).as("event_type"),
          $"f".getItem(2).cast("double").as("value"))
      val q = Streams.abMoments(stream)
        .select($"variant".cast("string").as("key"),
          concat_ws("|", $"n", $"sv", $"sv2").as("value"))
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

    // n grows monotonically: the final emission per variant is max-n
    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("variant"), split($"value", "\\|").as("f"))
      .select($"variant", $"f".getItem(0).cast("long").as("n"),
        $"f".getItem(1).as("sv"), $"f".getItem(2).as("sv2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"variant").orderBy($"n".desc)))
      .filter($"rn" === 1)
      .select($"variant", $"n", $"sv", $"sv2")
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, BigDecimal(r._3), BigDecimal(r._4)))).toMap

    val batch = Streams.abMoments(sources.Tables.events(spark, sf))
      .select($"variant".cast("long"), $"n", $"sv".cast("string"), $"sv2".cast("string"))
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, BigDecimal(r._3), BigDecimal(r._4)))).toMap

    assert(streamed.keySet == Set(0L, 1L))
    assert(streamed == batch)

    // derived Welch t agrees bit-for-bit with the batch formulation
    def t(m: Map[Long, (Long, BigDecimal, BigDecimal)]): Double = {
      def arm(v: Long): (Double, Double, Double) = {
        val (n, sv, sv2) = m(v)
        (n.toDouble, sv.toDouble, sv2.toDouble)
      }
      val (na, sa, qa) = arm(0L); val (nb, sb, qb) = arm(1L)
      val va = (qa - sa * sa / na) / (na - 1)
      val vb = (qb - sb * sb / nb) / (nb - 1)
      (sa / na - sb / nb) / math.sqrt(va / na + vb / nb)
    }
    assert(t(streamed) == t(batch))
  }
}
