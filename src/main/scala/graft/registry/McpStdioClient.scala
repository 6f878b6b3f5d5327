package graft.registry

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import graft.functions.AgentText
import graft.functions.AgentText.{JArr, JNum, JObj, JStr, JVal}
import graft.model.Tool

import scala.collection.immutable.ListMap

/** MCP stdio transport (reference manager.py:193-214 `_connect_server`
  * → `StdioServerParameters` + `stdio_client` + `ClientSession`): spawn
  * the server process from its config's command/args/env, speak
  * JSON-RPC 2.0 over newline-delimited stdio, run the `initialize`
  * handshake, then `tools/list` and `tools/call`.
  *
  * This is DRIVER-side control-plane plumbing, exactly like the
  * reference (servers are local subprocesses of the agent host):
  * registries stay bounded, and the tool lists it returns feed the
  * distributed [[Registry]] joins. The per-row dispatch path stays an
  * injected executor so dataflow tests remain hermetic; this class is
  * what a production deployment injects.
  */
final class McpStdioClient(
    command: Seq[String],
    env: Map[String, String] = Map.empty) extends AutoCloseable {

  private val proc = {
    val pb = new ProcessBuilder(command: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    // MCP servers conventionally log to stderr; inherit it so the pipe
    // can never fill and deadlock the server against our blocking
    // readLine (a ~64 KB stderr backlog would otherwise wedge both).
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    pb.start()
  }
  private val out = new BufferedWriter(
    new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
  private val in = new BufferedReader(
    new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
  private var nextId = 0L

  private def field(v: JVal, key: String): Option[JVal] = v match {
    case JObj(fields) => fields.collectFirst { case (k, x) if k == key => x }
    case _ => None
  }

  private def send(msg: JVal): Unit = {
    out.write(AgentText.renderJson(msg))
    out.write("\n")
    out.flush()
  }

  /** One request/response exchange; skips interleaved notifications
    * (messages without our id) as the protocol allows. */
  private def rpc(method: String, params: JVal): JVal = synchronized {
    nextId += 1
    val id = nextId
    send(JObj(ListMap(
      "jsonrpc" -> JStr("2.0"), "id" -> JNum(id.toDouble),
      "method" -> JStr(method), "params" -> params)))
    var result: Option[JVal] = None
    while (result.isEmpty) {
      val line = in.readLine()
      if (line == null)
        throw new java.io.EOFException(s"MCP server closed stdio during $method")
      AgentText.parseJson5ish(line).foreach { msg =>
        field(msg, "id") match {
          case Some(JNum(d)) if d.toLong == id =>
            field(msg, "error").foreach { e =>
              throw new RuntimeException(s"MCP $method error: ${AgentText.renderJson(e)}")
            }
            // A reply to our id with neither result nor error is
            // nonconforming; treat as empty rather than looping forever
            // waiting for a result that already went by.
            result = Some(field(msg, "result")
              .getOrElse(JObj(ListMap.empty[String, JVal])))
          case _ => () // notification or foreign id — skip
        }
      }
    }
    result.get
  }

  private def notifyInitialized(): Unit =
    send(JObj(ListMap(
      "jsonrpc" -> JStr("2.0"),
      "method" -> JStr("notifications/initialized"),
      "params" -> JObj(ListMap.empty[String, JVal]))))

  /** `session.initialize()` — returns the server's info/capabilities. */
  def initialize(): JVal = {
    val r = rpc("initialize", JObj(ListMap(
      "protocolVersion" -> JStr("2024-11-05"),
      "capabilities" -> JObj(ListMap.empty[String, JVal]),
      "clientInfo" -> JObj(ListMap(
        "name" -> JStr("graft"), "version" -> JStr("0.1"))))))
    notifyInitialized()
    r
  }

  /** `session.list_tools()` as [[Tool]] rows ready for the registry
    * joins (manager.py:216-233 get_tools shape). */
  def listTools(server: String, serverOrder: Long): Seq[Tool] =
    field(rpc("tools/list", JObj(ListMap.empty[String, JVal])), "tools") match {
      case Some(JArr(tools)) => tools.map { t =>
        Tool(
          name = field(t, "name").collect { case JStr(s) => s }.getOrElse(""),
          description = field(t, "description").collect { case JStr(s) => s }.getOrElse(""),
          inputSchema = field(t, "inputSchema").map(AgentText.renderJson).getOrElse("{}"),
          server = server,
          serverOrder = serverOrder)
      }
      case _ => Seq.empty
    }

  /** `session.call_tool(name, args)` — returns the first text content
    * block (manager.py:235-250 execute_tool path). */
  def callTool(name: String, argsJson: String): String = {
    val args = AgentText.parseJson5ish(argsJson)
      .getOrElse(JObj(ListMap.empty[String, JVal]))
    val r = rpc("tools/call", JObj(ListMap(
      "name" -> JStr(name), "arguments" -> args)))
    field(r, "content") match {
      case Some(JArr(blocks)) =>
        blocks.flatMap(b => field(b, "text").collect { case JStr(s) => s })
          .headOption.getOrElse("")
      case _ => ""
    }
  }

  override def close(): Unit = {
    try { out.close(); in.close() } catch { case _: Throwable => () }
    proc.destroy()
    if (!proc.waitFor(5, java.util.concurrent.TimeUnit.SECONDS)) proc.destroyForcibly()
  }
}
