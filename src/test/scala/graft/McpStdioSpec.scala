package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.model.Invocation
import graft.registry.{McpStdioClient, Registry}

/** The MCP stdio transport against a real subprocess speaking JSON-RPC
  * 2.0 over newline-delimited stdio (the reference's
  * StdioServerParameters/ClientSession shape, manager.py:193-214), and
  * the handoff from transport → distributed registry joins →
  * schema validation → tool call.
  */
class McpStdioSpec extends SparkSpec {

  private val fakeServer =
    """import sys, json
      |for line in sys.stdin:
      |    line = line.strip()
      |    if not line: continue
      |    msg = json.loads(line)
      |    m = msg.get("method")
      |    if m == "notifications/initialized": continue
      |    if m == "initialize":
      |        result = {"protocolVersion": "2024-11-05",
      |                  "serverInfo": {"name": "fake-mcp", "version": "1.0"},
      |                  "capabilities": {}}
      |    elif m == "tools/list":
      |        result = {"tools": [
      |            {"name": "add", "description": "adds two numbers",
      |             "inputSchema": {"type": "object", "properties": {
      |                 "a": {"type": "number"}, "b": {"type": "number"}}}},
      |            {"name": "echo", "description": "echoes a string",
      |             "inputSchema": {"type": "object", "properties": {
      |                 "s": {"type": "string"}}}}]}
      |    elif m == "tools/call":
      |        p = msg["params"]
      |        if p["name"] == "add":
      |            text = str(p["arguments"]["a"] + p["arguments"]["b"])
      |        else:
      |            text = p["arguments"].get("s", "")
      |        result = {"content": [{"type": "text", "text": text}]}
      |    else:
      |        sys.stdout.write(json.dumps({"jsonrpc": "2.0", "id": msg.get("id"),
      |            "error": {"code": -32601, "message": "unknown"}}) + "\n")
      |        sys.stdout.flush(); continue
      |    sys.stdout.write(json.dumps({"jsonrpc": "2.0", "id": msg["id"],
      |        "result": result}) + "\n")
      |    sys.stdout.flush()
      |""".stripMargin

  private def withClient(f: McpStdioClient => Unit): Unit = {
    val script = Files.createTempFile("fake_mcp", ".py")
    Files.write(script, fakeServer.getBytes(StandardCharsets.UTF_8))
    val client = new McpStdioClient(Seq("python3", script.toString))
    try f(client)
    finally { client.close(); Files.deleteIfExists(script) }
  }

  test("initialize handshake returns the server info") {
    withClient { c =>
      val r = c.initialize()
      assert(graft.functions.AgentText.renderJson(r).contains("fake-mcp"))
    }
  }

  test("tools/list maps to Tool rows; tools/call returns the text block") {
    withClient { c =>
      c.initialize()
      val tools = c.listTools("fake", serverOrder = 0)
      assert(tools.map(_.name).sorted == Seq("add", "echo"))
      assert(tools.forall(_.inputSchema.contains("properties")))
      assert(c.callTool("add", """{"a": 2, "b": 3}""") == "5")
      assert(c.callTool("echo", """{"s": "round trip"}""") == "round trip")
    }
  }

  test("transport-discovered tools drive the distributed registry joins") {
    import spark.implicits._
    withClient { c =>
      c.initialize()
      val tools = c.listTools("fake", serverOrder = 0).toDS()
      val invocations = Seq(
        Invocation(1, "add", """{"a": "5.0", "b": 7}"""), // "5.0" coerces (Q3)
        Invocation(2, "echo", """{"s": "hi"}"""),
        Invocation(3, "missing", """{}"""),
        Invocation(4, "add", """{"bogus": 1}""")).toDS()
      val resolved = Registry.resolve(invocations, tools).collect()
      assert(resolved.map(_._1.id).sorted.toSeq == Seq(1L, 2L, 4L)) // missing drops
      val validated = Registry.validateArgs(invocations, tools)
        .collect().map(v => v.id -> v).toMap
      assert(validated(1).valid && validated(1).argsJson.contains("\"a\": 5"))
      assert(validated(2).valid)
      assert(!validated(3).valid && !validated(4).valid)
      // dispatch the valid ones through the live transport
      val results = validated.values.filter(_.valid).toSeq.sortBy(_.id)
        .map(v => v.id -> c.callTool(v.name, v.argsJson))
      assert(results == Seq(1L -> "12", 2L -> "hi"))
    }
  }
}
