package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition pruning — the lake layout
  * every 100 TB deployment uses (date/source-partitioned directories).
  * A filter on the partition column must prune at the FILE level (the
  * unmatched directories are never opened), not merely at the row
  * level; `inputFiles` on the filtered frame is the ground truth, and
  * the plan shows the predicate under PartitionFilters. */
class PartitionPruningSpec extends SparkSpec {

  test("a partition-column filter reads only the matching directories") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString

    sources.Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val all = spark.read.parquet(dir)
    val filtered = all.filter($"event_type" === "purchase")

    // row-level correctness first (collect() so `filtered`'s own
    // adaptive plan executes and its scan metrics fill in)
    val expected = sources.Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(filtered.collect().length.toLong === expected && expected > 0)

    // file-level pruning: the scan's numFiles metric counts only the
    // purchase directory's files (inputFiles would lie here — it is
    // derived from the unfiltered file index)
    val scan = filtered.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec leaf"))
    val purchaseFiles = new java.io.File(dir, "event_type=purchase")
      .listFiles().count(_.getName.endsWith(".parquet")).toLong
    assert(scan.metrics("numFiles").value === purchaseFiles)
    assert(purchaseFiles < all.inputFiles.length)

    // and the plan carries the predicate as a partition filter, not a
    // post-scan row filter
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("purchase")),
      scan.metadata.toString)
  }
}
