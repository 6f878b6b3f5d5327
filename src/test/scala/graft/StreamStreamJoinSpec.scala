package graft

import java.nio.file.Files

import graft.io.CommitLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Watermarked stream–stream interval join: clicks ⋈ purchases of the
  * same user with the purchase inside [click, click + 1 h] — the
  * two-live-streams case (neither side is a static table), where
  * watermarks bound BOTH sides' join state so it can be evicted
  * instead of growing forever. Fed time-ordered through the
  * commit-log transport with a restart between the halves; the
  * appended matches must equal the batch interval join exactly. */
class StreamStreamJoinSpec extends SparkSpec {

  test("watermarked click-purchase interval join equals the batch join") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ssj_in").toString
    val out = Files.createTempDirectory("graft_ssj_out").toString
    val ckpt = Files.createTempDirectory("graft_ssj_ckpt").toString

    val ev = sources.Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_timestamp($"ts").as("tse"), $"event_id",
        $"event_type")

    // time-ordered halves: the watermark only moves forward, so replay
    // order must respect event time across the restart boundary
    val rows = ev.as[(Long, Long, Long, String)].collect()
      .sortBy(r => (r._2, r._3))
    val (half1, half2) = rows.splitAt(rows.length / 2)

    def append(chunk: Array[(Long, Long, Long, String)]): Unit =
      chunk.grouped(math.max(chunk.length / 2, 1)).zipWithIndex.foreach {
        case (part, p) =>
          CommitLog.append(in, p, part.map { r =>
            (r._3, r._3.toString, s"${r._1}:${r._2}:${r._3}:${r._4}")
          })
      }

    def run(): Unit = {
      val base = spark.readStream.format("commit-log").load(in)
        .select(split($"value", ":").as("f"))
        .select(
          $"f".getItem(0).cast("long").as("user_id"),
          timestamp_seconds($"f".getItem(1).cast("long")).as("ts"),
          $"f".getItem(2).cast("long").as("event_id"),
          $"f".getItem(3).as("event_type"))
      val clicks = base.filter($"event_type" === "click")
        .select($"user_id".as("cuser"), $"ts".as("cts"), $"event_id".as("click_id"))
        .withWatermark("cts", "30 minutes")
      val purchases = base.filter($"event_type" === "purchase")
        .select($"user_id".as("puser"), $"ts".as("pts"), $"event_id".as("purchase_id"))
        .withWatermark("pts", "30 minutes")
      val joined = clicks.join(purchases,
        expr("cuser = puser AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR"))
      val q = joined
        .select($"click_id".cast("string").as("key"),
          concat_ws(":", $"purchase_id", $"cuser").as("value"))
        .writeStream.format("commit-log")
        .option("path", out).option("partitions", "2")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(180000) finally q.stop()
    }

    append(half1)
    run()
    append(half2)
    run()

    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("click_id"),
        split($"value", ":").getItem(0).cast("long").as("purchase_id"))
      .as[(Long, Long)].collect().toSet

    val batch = ev.filter($"event_type" === "click")
      .select($"user_id".as("cuser"), $"tse".as("cts"), $"event_id".as("click_id"))
      .join(
        ev.filter($"event_type" === "purchase")
          .select($"user_id".as("puser"), $"tse".as("pts"), $"event_id".as("purchase_id")),
        expr("cuser = puser AND pts >= cts AND pts <= cts + 3600"))
      .select($"click_id", $"purchase_id")
      .as[(Long, Long)].collect().toSet

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("left-outer stream-stream join emits unmatched clicks after watermark expiry") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ssjo_in").toString
    val out = Files.createTempDirectory("graft_ssjo_out").toString
    val ckpt = Files.createTempDirectory("graft_ssjo_ckpt").toString

    val ev = sources.Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_timestamp($"ts").as("tse"), $"event_id",
        $"event_type")
    val rows = ev.as[(Long, Long, Long, String)].collect()
      .sortBy(r => (r._2, r._3))
    // Sentinels far past the data on BOTH streams: the global watermark
    // is the MIN of the per-stream watermarks, so a click-only sentinel
    // leaves the purchase side's watermark (and thus eviction of the
    // last unmatched clicks) behind. With both advanced, every real
    // click's eviction timer fires and the outer result is exact, not
    // merely eventual.
    val far = rows.map(_._2).max + 86400L
    val sentinels = Array((-1L, far, -1L, "click"), (-1L, far, -2L, "purchase"))

    def append(batchNo: Int, chunk: Array[(Long, Long, Long, String)]): Unit =
      CommitLog.append(in, batchNo, chunk.map { r =>
        (r._3, r._3.toString, s"${r._1}:${r._2}:${r._3}:${r._4}")
      })

    def run(): Unit = {
      val base = spark.readStream.format("commit-log").load(in)
        .select(split($"value", ":").as("f"))
        .select(
          $"f".getItem(0).cast("long").as("user_id"),
          timestamp_seconds($"f".getItem(1).cast("long")).as("ts"),
          $"f".getItem(2).cast("long").as("event_id"),
          $"f".getItem(3).as("event_type"))
      val clicks = base.filter($"event_type" === "click")
        .select($"user_id".as("cuser"), $"ts".as("cts"), $"event_id".as("click_id"))
        .withWatermark("cts", "10 minutes")
      val purchases = base.filter($"event_type" === "purchase")
        .select($"user_id".as("puser"), $"ts".as("pts"), $"event_id".as("purchase_id"))
        .withWatermark("pts", "10 minutes")
      val joined = clicks.join(purchases,
        expr("cuser = puser AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR"),
        "left_outer")
      val q = joined
        .select($"click_id".cast("string").as("key"),
          concat_ws(":", coalesce($"purchase_id", lit(-999L)), $"cuser").as("value"))
        .writeStream.format("commit-log")
        .option("path", out).option("partitions", "2")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(180000) finally q.stop()
    }

    val (half1, half2) = rows.splitAt(rows.length / 2)
    append(0, half1); run()
    append(1, half2); run()
    append(2, sentinels); run()

    val streamed = spark.read.format("commit-log").load(out)
      .select($"key".cast("long").as("click_id"),
        split($"value", ":").getItem(0).cast("long").as("purchase_id"))
      .as[(Long, Long)].collect()
      .filter(_._1 != -1L) // the sentinel click itself may or may not flush
      .toSet

    val batch = ev.filter($"event_type" === "click")
      .select($"user_id".as("cuser"), $"tse".as("cts"), $"event_id".as("click_id"))
      .join(
        ev.filter($"event_type" === "purchase")
          .select($"user_id".as("puser"), $"tse".as("pts"), $"event_id".as("purchase_id")),
        expr("cuser = puser AND pts >= cts AND pts <= cts + 3600"),
        "left_outer")
      .select($"click_id", coalesce($"purchase_id", lit(-999L)).as("purchase_id"))
      .as[(Long, Long)].collect().toSet

    assert(streamed == batch)
    // the outer semantics actually fired: some clicks really are unmatched
    assert(batch.exists(_._2 == -999L))
    assert(batch.exists(_._2 != -999L))
  }

  test("full-outer stream-stream join emits both sides' unmatched rows") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ssjf_in").toString
    val out = Files.createTempDirectory("graft_ssjf_out").toString
    val ckpt = Files.createTempDirectory("graft_ssjf_ckpt").toString

    val ev = sources.Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_timestamp($"ts").as("tse"), $"event_id",
        $"event_type")
    val rows = ev.as[(Long, Long, Long, String)].collect()
      .sortBy(r => (r._2, r._3))
    // dual sentinels, same rationale as the left-outer case: both
    // sides' watermarks must pass every real row's eviction timer
    val far = rows.map(_._2).max + 86400L
    val sentinels = Array((-1L, far, -1L, "click"), (-1L, far, -2L, "purchase"))

    def append(batchNo: Int, chunk: Array[(Long, Long, Long, String)]): Unit =
      CommitLog.append(in, batchNo, chunk.map { r =>
        (r._3, r._3.toString, s"${r._1}:${r._2}:${r._3}:${r._4}")
      })

    def run(): Unit = {
      val base = spark.readStream.format("commit-log").load(in)
        .select(split($"value", ":").as("f"))
        .select(
          $"f".getItem(0).cast("long").as("user_id"),
          timestamp_seconds($"f".getItem(1).cast("long")).as("ts"),
          $"f".getItem(2).cast("long").as("event_id"),
          $"f".getItem(3).as("event_type"))
      val clicks = base.filter($"event_type" === "click")
        .select($"user_id".as("cuser"), $"ts".as("cts"), $"event_id".as("click_id"))
        .withWatermark("cts", "10 minutes")
      val purchases = base.filter($"event_type" === "purchase")
        .select($"user_id".as("puser"), $"ts".as("pts"), $"event_id".as("purchase_id"))
        .withWatermark("pts", "10 minutes")
      val joined = clicks.join(purchases,
        expr("cuser = puser AND pts >= cts AND pts <= cts + INTERVAL 1 HOUR"),
        "full_outer")
      val q = joined
        .select(coalesce($"click_id", -$"purchase_id").cast("string").as("key"),
          concat_ws(":", coalesce($"click_id", lit(-999L)),
            coalesce($"purchase_id", lit(-999L))).as("value"))
        .writeStream.format("commit-log")
        .option("path", out).option("partitions", "2")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(180000) finally q.stop()
    }

    val (half1, half2) = rows.splitAt(rows.length / 2)
    append(0, half1); run()
    append(1, half2); run()
    append(2, sentinels); run()

    val streamed = spark.read.format("commit-log").load(out)
      .select(split($"value", ":").getItem(0).cast("long").as("click_id"),
        split($"value", ":").getItem(1).cast("long").as("purchase_id"))
      .as[(Long, Long)].collect()
      .filter(r => r._1 != -1L && r._2 != -2L) // sentinel rows themselves
      .toSet

    val batch = ev.filter($"event_type" === "click")
      .select($"user_id".as("cuser"), $"tse".as("cts"), $"event_id".as("click_id"))
      .join(
        ev.filter($"event_type" === "purchase")
          .select($"user_id".as("puser"), $"tse".as("pts"), $"event_id".as("purchase_id")),
        expr("cuser = puser AND pts >= cts AND pts <= cts + 3600"),
        "full_outer")
      .select(coalesce($"click_id", lit(-999L)).as("click_id"),
        coalesce($"purchase_id", lit(-999L)).as("purchase_id"))
      .as[(Long, Long)].collect().toSet

    assert(streamed == batch)
    // all three row classes really occur: matched, click-only, purchase-only
    assert(batch.exists(r => r._1 != -999L && r._2 != -999L))
    assert(batch.exists(r => r._2 == -999L))
    assert(batch.exists(r => r._1 == -999L))
  }
}
