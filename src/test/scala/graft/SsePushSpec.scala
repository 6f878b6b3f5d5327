package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.{Executors, TimeUnit}

import graft.io.CommitLog
import graft.memory.MemoryStore
import graft.model.{Message, Tool}
import graft.provider.StubProvider
import graft.serve.{ChatService, SseTail, ViewServer}
import graft.task.TaskStore

/** The push-socket entry point (reference app.py:411-448): a client
  * holds an SSE connection open on the chat push topic and receives
  * each turn as it is committed — plus the two properties the
  * reference's websocket lacked: offset resume via `Last-Event-ID`
  * and per-session filtering on the durable log. */
class SsePushSpec extends SparkSpec {

  private val http = HttpClient.newHttpClient()
  private def post(url: String, body: String): (Int, String) = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(url))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** Blocks until the server closes the stream (the `n=` cap). */
  private def sse(url: String, lastEventId: Option[String] = None): String = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
    lastEventId.foreach(id => b.header("Last-Event-ID", id))
    http.send(b.build(), HttpResponse.BodyHandlers.ofString()).body()
  }

  private def dataLines(body: String): Seq[String] =
    body.linesIterator.filter(_.startsWith("data: ")).map(_.drop(6)).toSeq

  private def lastId(body: String): String =
    body.linesIterator.filter(_.startsWith("id: ")).map(_.drop(4)).toSeq.last

  test("a held-open SSE connection receives chat turns as they are pushed") {
    import spark.implicits._
    val pushDir = Files.createTempDirectory("graft_sse_push").toString
    val stub = new StubProvider(canned = Seq(
      "## Query:\nfirst" -> """```json
{"text": "turn one", "finished": true}
```""",
      "## Query:\nsecond" -> """```json
{"text": "turn two", "finished": true}
```"""))
    val svc = new ChatService(stub,
      ChatService.State(MemoryStore.empty(spark), TaskStore.empty(spark),
        spark.emptyDataset[Message]),
      spark.emptyDataset[Tool], pushDir)
    val server = new ViewServer(
      routes = Map.empty,
      postRoutes = Map("/chat" -> svc.handle),
      sseRoutes = Map("/chat/stream" -> SseTail(pushDir)))
    val port = server.start()
    val exec = Executors.newSingleThreadExecutor()
    try {
      val (s1, _) = post(s"http://127.0.0.1:$port/chat",
        """{"session_id": "s1", "query": "first", "ts": 100}""")
      assert(s1 == 200)
      // subscribe from offset 0 while the stream stays open for turn 2
      val fut = exec.submit { () =>
        sse(s"http://127.0.0.1:$port/chat/stream?replay=all&n=2")
      }
      Thread.sleep(300) // normally the connection is live before turn 2 lands
      val (s2, _) = post(s"http://127.0.0.1:$port/chat",
        """{"session_id": "s1", "query": "second", "ts": 200}""")
      assert(s2 == 200)
      val body = fut.get(60, TimeUnit.SECONDS)
      val events = dataLines(body)
      assert(events.length == 2)
      assert(events(0).contains("turn one") && events(0).contains(""""key": "s1""""))
      assert(events(1).contains("turn two"))
    } finally { exec.shutdownNow(); server.close() }
  }

  test("Last-Event-ID resumes past delivered records; key filter scopes a session") {
    val dir = Files.createTempDirectory("graft_sse_log").toString
    CommitLog.append(dir, 0, Seq((1L, "sA", "a1"), (2L, "sB", "b1")))
    CommitLog.append(dir, 1, Seq((3L, "sA", "a2")))
    val server = new ViewServer(
      routes = Map.empty,
      sseRoutes = Map("/tail" -> SseTail(dir)))
    val port = server.start()
    try {
      // first subscription drains two events, remembers where it stopped
      val first = sse(s"http://127.0.0.1:$port/tail?replay=all&n=2")
      assert(dataLines(first).length == 2)
      val resumeFrom = lastId(first)

      // new records land while the client is away
      CommitLog.append(dir, 0, Seq((4L, "sB", "b2")))

      // resume: only records past the delivered offsets arrive
      val second = sse(s"http://127.0.0.1:$port/tail?n=2",
        lastEventId = Some(resumeFrom))
      val resumed = dataLines(second)
      assert(resumed.length == 2)
      assert(resumed.forall(e => e.contains(""""value": "a2"""") ||
        e.contains(""""value": "b2"""")))

      // key filter: session A's client sees only session A's records
      val onlyA = dataLines(sse(s"http://127.0.0.1:$port/tail?replay=all&key=sA&n=2"))
      assert(onlyA.length == 2)
      assert(onlyA.forall(_.contains(""""key": "sA"""")))
    } finally server.close()
  }
}
