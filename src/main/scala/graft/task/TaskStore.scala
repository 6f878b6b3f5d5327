package graft.task

import java.sql.Timestamp

import graft.functions.AgentText
import graft.model._
import graft.provider.Provider
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Task-state knobs (reference configs.json:15, task.py:620). */
final case class TaskConfig(maxLogs: Int = 50, summaryCap: Int = 200)

/** Task state as three Datasets (D6–D8) + the reference's operators
  * (SURVEY.md §2: A2/A3/A6/A9, T3/T4, F6/F9/F10, J3).
  *
  * Scale stance: `logs`/`files` are the growing relations — views over
  * them are partition-parallel groupBys joined back to the (small)
  * task dimension with the dimension broadcast; per-task retention is
  * one ranking window over (taskId, ts).
  */
final case class TaskStore(
    tasks: Dataset[TaskRow],
    logs: Dataset[TaskLog],
    files: Dataset[ExtractedFileRow],
    config: TaskConfig = TaskConfig()) {

  private def spark: SparkSession = tasks.sparkSession

  /** Append a log record then trim to the newest maxLogs per task
    * (task.py:617-623); the response summary is capped with ellipsis
    * (task.py:505-509, T3). */
  def appendLog(log: TaskLog): TaskStore = {
    val sp = spark; import sp.implicits._
    val capped = log.copy(responseSummary =
      AgentText.summarize(log.responseSummary, config.summaryCap))
    val appended = logs.union(Seq(capped).toDS())
    val w = Window.partitionBy($"taskId").orderBy(desc("ts"))
    val trimmed = appended.withColumn("rn", row_number().over(w))
      .filter($"rn" <= config.maxLogs).drop("rn").as[TaskLog]
    copy(logs = trimmed)
  }

  /** Upsert scalar task fields; title derived from target when absent
    * (task.py:350-370, F9). */
  def upsertTask(row: TaskRow): TaskStore = {
    val sp = spark; import sp.implicits._
    val withTitle =
      if (row.title.nonEmpty) row
      else row.copy(title = AgentText.titleFromTarget(row.target))
    copy(tasks = tasks.filter($"taskId" =!= row.taskId)
      .as[TaskRow].union(Seq(withTitle).toDS()))
  }

  /** A2 — per-type file counts, presented like `get_file_summary`
    * (task.py:87-100): "Extracted N files: 2 code file(s), ...". */
  def fileSummary(taskId: Long): String = {
    val sp = spark; import sp.implicits._
    val counts = files.filter($"taskId" === taskId)
      .groupBy($"fileType").agg(count(lit(1)).as("n"))
      .orderBy($"fileType")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (counts.isEmpty) "No files extracted"
    else {
      val total = counts.map(_._2).sum
      val parts = counts.map { case (t, n) => s"$n $t file(s)" }
      s"Extracted $total files: ${parts.mkString(", ")}"
    }
  }

  /** A3/A6 — the `/api/tasks` view (app.py:140-175): per-task log and
    * file counts plus last-updated (latest log ts, else created_at). */
  def tasksView: DataFrame = {
    val sp = spark; import sp.implicits._
    val logCounts = logs.groupBy($"taskId".as("lt"))
      .agg(count(lit(1)).as("logs_count"), max($"ts").as("last_log_ts"))
    val fileCounts = files.groupBy($"taskId".as("ft"))
      .agg(count(lit(1)).as("files_count"))
    tasks
      .join(logCounts, $"taskId" === $"lt", "left").drop("lt")
      .join(fileCounts, $"taskId" === $"ft", "left").drop("ft")
      .select($"taskId", $"taskType", $"title", $"target", $"progress",
        coalesce($"logs_count", lit(0L)).as("logs_count"),
        coalesce($"files_count", lit(0L)).as("files_count"),
        coalesce($"last_log_ts", $"createdAt").as("last_updated"))
      .orderBy($"taskId")
  }

  /** J3 — file lookup across a task's logs (app.py:450-481). */
  def findFile(taskId: Long, filename: String): Option[ExtractedFileRow] = {
    val sp = spark; import sp.implicits._
    files.filter($"taskId" === taskId && $"filename" === filename)
      .orderBy(desc("logTs")).collect().headOption
  }
}

object TaskStore {

  def empty(spark: SparkSession, config: TaskConfig = TaskConfig()): TaskStore = {
    val sp = spark; import sp.implicits._
    TaskStore(spark.emptyDataset[TaskRow], spark.emptyDataset[TaskLog],
      spark.emptyDataset[ExtractedFileRow], config)
  }

  /** One LLM-identified extractable span (task.py:221-229). */
  final case class IdentifiedSpan(
      startMarker: String, endMarker: String, contentType: String,
      title: String, description: String)

  /** Parse the extractor LLM's `{"files": [...]}` response
    * (task.py:199-206). */
  def parseIdentified(response: String): Seq[IdentifiedSpan] = {
    import AgentText._
    val (_, data) = splitContentAndJson(response)
    data.toSeq.flatMap { obj =>
      obj.fields.get("files") match {
        case Some(JArr(items)) => items.collect { case JObj(f) =>
          def str(k: String, dflt: String) = f.get(k) match {
            case Some(JStr(s)) => s; case _ => dflt
          }
          IdentifiedSpan(str("start_marker", ""), str("end_marker", ""),
            str("content_type", "text"), str("title", "untitled"),
            str("description", ""))
        }
        case _ => Seq.empty
      }
    }
  }

  /** The file-extraction pipeline (task.py:211-261): LLM identifies
    * marker spans, then for each span with >100 chars of content the
    * span (markers inclusive; 20-line fallback, F6/Q11) becomes an
    * [[ExtractedFileRow]] with a sanitized filename (F10). Runs on the
    * driver per response text — extraction over a *corpus* of texts
    * wraps this in mapPartitions with one provider per partition. */
  def extractFiles(
      taskId: Long, logTs: Timestamp, text: String, provider: Provider)
      : Seq[ExtractedFileRow] = {
    val prompt = analyzePrompt(text)
    val spans = parseIdentified(provider.generateResponse(prompt))
    spans.flatMap { span =>
      val content = AgentText.extractBetweenMarkers(text, span.startMarker, span.endMarker)
      if (content.trim.length > 100) {
        val trimmed = content.trim
        val ext = AgentText.fileExtension(span.contentType)
        Some(ExtractedFileRow(
          taskId, logTs,
          AgentText.safeFilename(span.title, span.contentType),
          span.contentType, trimmed, trimmed.length.toLong,
          if (ext == "md") "markdown" else "text",
          Map(
            "extraction_method" -> "llm_analysis",
            "description" -> span.description,
            "original_title" -> span.title,
            "content_type" -> span.contentType)))
      } else None
    }
  }

  /** Extractor analysis prompt (task.py:163-198 shape, condensed). */
  def analyzePrompt(text: String): String =
    s"""Analyze the following text and identify extractable file content.
Respond in JSON enclosed in triple backticks with:
- "files": array of {"start_marker", "end_marker", "content_type", "title", "description"}

Text:
$text"""
}
