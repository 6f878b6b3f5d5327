package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.file.Files

import graft.model.Tool
import graft.provider.StubProvider

/** The interactive CLI loop (reference client.py:339-396) driven by a
  * scripted stdin: slash commands, a ReAct turn with a memory op, and
  * the push topic receiving the response.
  */
class AgentReplSpec extends SparkSpec {

  test("scripted session: /task new, chat turn, /mem_ops, /tools, /quit") {
    import spark.implicits._
    val pushDir = Files.createTempDirectory("graft_repl_spec").toString
    val stub = new StubProvider(canned = Seq(
      "## Query:\nwhat dedup methods exist?" ->
        """```json
{"text": "MinHash-LSH for Jaccard, SimHash for Hamming.",
 "mem_op": {"name": "add_memory_record",
            "args": {"memory": "user asked about dedup methods"}},
 "finished": true}
```"""))
    val tools = Seq(
      Tool("search_docs", "keyword search", "{}", "local", 0)).toDS()
    val script =
      """/task new research dedup approaches
        |what dedup methods exist?
        |/mem_ops
        |/tools
        |/nonsense
        |/quit
        |""".stripMargin
    val bytes = new ByteArrayOutputStream()
    AgentRepl.run(spark, stub, tools, pushDir,
      new BufferedReader(new StringReader(script)), new PrintStream(bytes, true, "UTF-8"))
    val out = bytes.toString("UTF-8")
    assert(out.contains("task 1 created and loaded"))
    assert(out.contains("agent> MinHash-LSH for Jaccard, SimHash for Hamming."))
    assert(out.contains("task 1]"))
    assert(out.contains("memory records (1):"))
    assert(out.contains("- user asked about dedup methods"))
    assert(out.contains("tools (1):"))
    assert(out.contains("search_docs [local]: keyword search"))
    assert(out.contains("unknown command: /nonsense"))

    // the turn's response also landed on the push topic
    val pushed = spark.read.format("commit-log").load(pushDir)
      .select("key", "value").as[(String, String)].collect()
    assert(pushed.toSeq == Seq(("repl", "MinHash-LSH for Jaccard, SimHash for Hamming.")))
  }
}
