package graft.operators

import graft.{sources, QueryDef}
import graft.io.CommitLog
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked round-trip through the commit-log DSv2 source
  * (graft.io.CommitLogSource): the events table is staged into a
  * 4-partition topic keyed by `user_id % 4` and read back through the
  * batch scan, proving the offset contract (per-partition, append
  * order) against a pure-SQL oracle.
  *
  * Staging is executor-side — each task appends the segment files for
  * the log partitions it owns (hash-partitioned, so a log partition is
  * written by exactly one task); the driver never sees a record. At
  * cluster scale the directory lives on the shared filesystem and a
  * task would roll segments at a size bound rather than buffering a
  * whole partition.
  */
object CommitLogOps {

  /** Stage events into a fresh commit-log topic, one segment per log
    * partition, records in event_id order (the deterministic append
    * order the oracle mirrors with ROW_NUMBER). */
  def stageEvents(spark: SparkSession, dir: String, logDir: String, nPart: Int): Unit = {
    val path = java.nio.file.Paths.get(logDir)
    if (java.nio.file.Files.exists(path)) {            // fresh topic per run
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    sources.Tables.events(spark, dir)
      .select((col("user_id") % nPart).cast("int").as("pid"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .repartition(nPart, col("pid"))
      .sortWithinPartitions("pid", "event_id")
      .foreachPartition { (rows: Iterator[Row]) =>
        // rows arrive grouped by pid (sorted); buffer one group at a time
        var curPid = Int.MinValue
        val buf = scala.collection.mutable.ArrayBuffer[(Long, String, String)]()
        def flush(): Unit = if (buf.nonEmpty) {
          CommitLog.append(logDir, curPid, buf.toSeq)
          buf.clear()
        }
        rows.foreach { r =>
          val pid = r.getInt(0)
          if (pid != curPid) { flush(); curPid = pid }
          buf += ((r.getLong(1), r.getLong(2).toString, r.getString(3)))
        }
        flush()
      }
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "cl_commit_log",
      Some("""
        SELECT CAST(user_id % 4 AS BIGINT) AS part_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id % 4 ORDER BY event_id) - 1 AS BIGINT) AS off,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CAST(event_id AS VARCHAR) AS key,
               event_type AS value
        FROM events
        ORDER BY part_id, off
      """.trim),
      (spark, dir) => {
        val logDir = s"${System.getProperty("java.io.tmpdir")}/graft_commitlog_${math.abs(dir.hashCode)}"
        stageEvents(spark, dir, logDir, nPart = 4)
        spark.read.format("commit-log").load(logDir)
          .select(col("partition").cast("bigint").as("part_id"),
            col("offset").as("off"),
            unix_micros(col("ts")).as("ts_us"),
            col("key"), col("value"))
          .orderBy("part_id", "off")
      }))
}
