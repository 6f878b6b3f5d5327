package graft.io

import java.util

import graft.functions.AgentText
import graft.functions.AgentText.{JNum, JObj, JStr, JVal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's native memory-snapshot
  * files (`memory.py:63-76` writes `{records, summary, topics,
  * database}` as one JSON object per session). Usage:
  *
  * {{{
  * spark.read.format("memory-snapshot")
  *   .option("section", "topics")          // records|summaries|topics|database
  *   .load("/path/to/memory-xyz.json")
  * }}}
  *
  * A user of the reference points this at their existing ./data/memory
  * files and queries them with full Spark SQL — no conversion step.
  * Snapshot files are bounded (the reference caps every section), so
  * one InputPartition per file is the right parallelism; the JSON is
  * parsed with the engine's dependency-free lenient parser.
  */
class MemorySnapshotSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "memory-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MemorySnapshotSource.schemaFor(options.getOrDefault("section", "records"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemorySnapshotTable(
      properties.getOrDefault("section", "records"),
      properties.getOrDefault("path", ""))
}

object MemorySnapshotSource {
  val sections = Seq("records", "summaries", "topics", "database",
    "tasks", "task_logs")

  def schemaFor(section: String): StructType = section match {
    case "records" => StructType(Seq(
      StructField("ts", StringType), StructField("content", StringType)))
    case "summaries" => StructType(Seq(
      StructField("ts", StringType), StructField("text", StringType)))
    case "topics" => StructType(Seq(
      StructField("name", StringType), StructField("description", StringType),
      StructField("created", StringType), StructField("last_updated", StringType),
      StructField("frequency", LongType)))
    case "database" => StructType(Seq(
      StructField("key", StringType), StructField("value", StringType)))
    // task-<label>.json (task.py:406-421): {id: {target, plan, progress, logs}}
    case "tasks" => StructType(Seq(
      StructField("task_id", LongType), StructField("target", StringType),
      StructField("plan", StringType), StructField("progress", StringType),
      StructField("n_logs", LongType)))
    case "task_logs" => StructType(Seq(
      StructField("task_id", LongType), StructField("ts", StringType),
      StructField("query", StringType), StructField("response_summary", StringType),
      StructField("error", StringType)))
    case other => throw new IllegalArgumentException(
      s"unknown section '$other' (expected one of ${sections.mkString("/")})")
  }
}

final class MemorySnapshotTable(section: String, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"memory-snapshot($section, $path)"
  override def schema(): StructType = MemorySnapshotSource.schemaFor(section)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemorySnapshotScan(section,
      if (path.nonEmpty) path else options.get("path"))
}

final class MemorySnapshotScan(section: String, path: String)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = MemorySnapshotSource.schemaFor(section)
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(MemorySnapshotPartition(section, path))
  override def createReaderFactory(): PartitionReaderFactory =
    new MemorySnapshotReaderFactory
}

final case class MemorySnapshotPartition(section: String, path: String)
    extends InputPartition

final class MemorySnapshotReaderFactory extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MemorySnapshotPartition]
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.path)), "UTF-8")
    val root = AgentText.parseJson5ish(text) match {
      case Some(o: JObj) => o
      case _ => JObj(scala.collection.immutable.ListMap.empty)
    }
    def s(v: JVal): UTF8String = v match {
      case JStr(x) => UTF8String.fromString(x)
      case JNum(d) =>
        UTF8String.fromString(
          if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString)
      case other => UTF8String.fromString(other.toString)
    }
    val rows: Iterator[InternalRow] = p.section match {
      case "records" => root.fields.get("records") match {
        case Some(AgentText.JArr(items)) => items.iterator.collect {
          case JObj(f) => InternalRow(
            s(f.getOrElse("timestamp", JStr(""))), s(f.getOrElse("content", JStr(""))))
        }
        case _ => Iterator.empty
      }
      case "summaries" => root.fields.get("summary") match {
        case Some(JObj(f)) => f.iterator.map { case (ts, v) =>
          InternalRow(UTF8String.fromString(ts), s(v))
        }
        case _ => Iterator.empty
      }
      case "topics" => root.fields.get("topics") match {
        case Some(JObj(f)) => f.iterator.map {
          case (name, JObj(t)) => InternalRow(
            UTF8String.fromString(name),
            s(t.getOrElse("description", JStr(""))),
            s(t.getOrElse("created", JStr(""))),
            s(t.getOrElse("last_updated", JStr(""))),
            t.get("frequency") match { case Some(JNum(d)) => d.toLong; case _ => 0L })
          case (name, other) => InternalRow(
            UTF8String.fromString(name), s(other),
            UTF8String.fromString(""), UTF8String.fromString(""), 0L)
        }
        case _ => Iterator.empty
      }
      case "database" => root.fields.get("database") match {
        case Some(JObj(f)) => f.iterator.map { case (k, v) =>
          InternalRow(UTF8String.fromString(k), s(v))
        }
        case _ => Iterator.empty
      }
      // task snapshots: the whole file is {taskId: {target, plan, ...}}
      case "tasks" => root.fields.iterator.collect {
        case (id, JObj(t)) => InternalRow(
          id.toLongOption.getOrElse(-1L),
          s(t.getOrElse("target", JStr(""))),
          s(t.getOrElse("plan", JStr(""))),
          s(t.getOrElse("progress", JStr(""))),
          t.get("logs") match { case Some(AgentText.JArr(l)) => l.size.toLong; case _ => 0L })
      }
      case "task_logs" => root.fields.iterator.flatMap {
        case (id, JObj(t)) => t.get("logs") match {
          case Some(AgentText.JArr(logs)) => logs.collect {
            case JObj(l) => InternalRow(
              id.toLongOption.getOrElse(-1L),
              s(l.getOrElse("timestamp", JStr(""))),
              s(l.getOrElse("query", JStr(""))),
              s(l.getOrElse("response_summary", JStr(""))),
              l.get("error") match {
                case Some(JStr(e)) => UTF8String.fromString(e)
                case _ => null
              })
          }
          case _ => Seq.empty
        }
        case _ => Seq.empty
      }
      case _ => Iterator.empty
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
