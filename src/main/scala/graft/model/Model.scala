package graft.model

import java.sql.Timestamp

/** The agent data plane (SURVEY.md §1.1 D1–D9): the reference's
  * in-memory Python collections re-expressed as typed Spark Datasets.
  * Timestamps are real TimestampType — the reference's sortable string
  * stamps (`utils.py:12-13`) become presentation formatting only, which
  * preserves its lexicographic-order tricks exactly (max key = latest).
  */

/** D1 — conversation message (client.py:18,218). */
final case class Message(
    sessionId: String, seq: Long, role: String, content: String, ts: Timestamp)

/** D2 — append-only memory record (memory.py:55,249-251). */
final case class MemoryRecord(sessionId: String, ts: Timestamp, content: String)

/** D3 — memory summary; newest `savedSummaryNum` kept (memory.py:56,305-312). */
final case class Summary(sessionId: String, ts: Timestamp, text: String)

/** D4 — memory topic with upsert + eviction state (memory.py:315-344). */
final case class Topic(
    sessionId: String, name: String, description: String,
    created: Timestamp, lastUpdated: Timestamp, frequency: Long)

/** D5 — memory key-value fact (memory.py:56,253-261). */
final case class KvEntry(sessionId: String, key: String, value: String)

/** D6 — task scalar fields (task.py:293-300). */
final case class TaskRow(
    taskId: Long, taskType: String, title: String, target: String,
    plan: String, progress: String, createdAt: Timestamp)

/** D7 — one task log record (task.py:51-131); files normalized to D8. */
final case class TaskLog(
    taskId: Long, ts: Timestamp, query: String, responseSummary: String,
    entries: Seq[String], metadata: Map[String, String], error: String)

/** D8 — extracted file (task.py:10-49). */
final case class ExtractedFileRow(
    taskId: Long, logTs: Timestamp, filename: String, fileType: String,
    content: String, size: Long, format: String, metadata: Map[String, String])

/** D9 — tool registry entry; `inputSchema` kept as JSON (manager.py:216-234). */
final case class Tool(
    name: String, description: String, inputSchema: String, server: String,
    serverOrder: Long)

/** A tool/memory-op invocation request (the LLM's proposed action). */
final case class Invocation(id: Long, name: String, argsJson: String)

/** Validation outcome for an invocation (J2, memory.py:207-247). */
final case class ValidatedInvocation(
    id: Long, name: String, argsJson: String, valid: Boolean, error: String)
