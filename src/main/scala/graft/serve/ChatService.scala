package graft.serve

import java.sql.Timestamp

import graft.agent.ReactLoop
import graft.functions.AgentText
import graft.functions.AgentText.{JNum, JObj, JStr}
import graft.io.CommitLog
import graft.memory.MemoryStore
import graft.model.{Message, Tool}
import graft.provider.Provider
import graft.task.TaskStore
import org.apache.spark.sql.Dataset

/** The write-side chat turn (reference app.py:396-444 end-to-end):
  * `POST /chat {"session_id": ..., "query": ..., "task_id"?: n,
  * "ts"?: epochSeconds}` runs one full ReAct turn ([[ReactLoop]]:
  * assemble → provider → parse → mem ops → tool dispatch → task log)
  * against the live stores, APPENDS the assistant response to a
  * commit-log topic — the push channel: any consumer tailing that
  * topic through the `commit-log` stream source receives the turn,
  * which is the engine's analog of the reference's
  * `socketio.emit('chat_response', ...)` (app.py:433-438) with
  * replay/offset semantics the websocket never had — and returns the
  * response JSON to the caller.
  *
  * Turns are serialized (`synchronized`): chat state transitions are
  * single-writer per service, the same per-process session contract as
  * the reference; reads (the GET views) observe the latest committed
  * state via [[state]].
  */
final class ChatService(
    provider: Provider,
    state0: ChatService.State,
    tools: Dataset[Tool],
    pushLogDir: String,
    nPartitions: Int = 4,
    toolExecutor: (String, String) => String = (n, _) => s"[no executor for $n]") {

  @volatile private var current: ChatService.State = state0

  /** Latest committed store state (for wiring GET views). */
  def state: ChatService.State = current

  /** External state edit (e.g. a REPL's `/task new`), serialized with
    * turn processing. */
  def updateState(f: ChatService.State => ChatService.State): Unit =
    synchronized { current = f(current) }

  private val loop = new ReactLoop(provider, toolExecutor = toolExecutor)

  /** One chat turn: run the ReAct loop against the live stores, commit
    * the new state, push the assistant response onto the commit log.
    * Returns (responseText, iterations). */
  def processTurn(sessionId: String, query: String, taskId: Option[Long],
      now: Timestamp): (String, Int) = synchronized {
    val st = current
    val out = loop.processQuery(sessionId, query, st.memory, st.tasks,
      tools, st.messages, taskId, now)
    val sp = st.messages.sparkSession
    import sp.implicits._
    current = ChatService.State(out.memory, out.tasks,
      st.messages.union(out.newMessages.toDS()))
    val responseText = out.newMessages.reverse
      .collectFirst { case m if m.role == "assistant" => m.content }
      .getOrElse("")
    // push channel: append to the session's log partition; consumers
    // tail it via spark.readStream.format("commit-log")
    CommitLog.append(pushLogDir,
      math.floorMod(sessionId.hashCode, nPartitions),
      Seq((now.getTime * 1000L, sessionId, responseText)))
    (responseText, out.iterations)
  }

  /** One POST body → one turn → response JSON. Malformed bodies throw
    * (the server maps that to a 500). */
  def handle(body: String): String = {
    val fields = AgentText.parseJson5ish(body) match {
      case Some(JObj(f)) => f
      case _ => throw new IllegalArgumentException("body is not a JSON object")
    }
    def str(k: String): Option[String] =
      fields.get(k).collect { case JStr(s) => s }
    val sessionId = str("session_id").getOrElse("default")
    val query = str("query").getOrElse(
      throw new IllegalArgumentException("missing 'query'"))
    val taskId = fields.get("task_id").collect { case JNum(d) => d.toLong }
    val now = fields.get("ts") match {
      case Some(JNum(d)) => new Timestamp(d.toLong * 1000L)
      case _ => new Timestamp(System.currentTimeMillis())
    }
    val (responseText, iterations) = processTurn(sessionId, query, taskId, now)
    s"""{"session_id": "${AgentText.escapeJson(sessionId)}", """ +
      s""""response": "${AgentText.escapeJson(responseText)}", """ +
      s""""iterations": $iterations}"""
  }
}

object ChatService {
  /** The mutable-by-replacement session state a chat turn advances. */
  final case class State(
      memory: MemoryStore, tasks: TaskStore, messages: Dataset[Message])
}
