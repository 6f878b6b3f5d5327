package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp

import graft.model.{TaskRow, Tool}
import graft.registry.Registry
import graft.serve.ViewServer
import graft.task.TaskStore

/** The REST view shim: the reference's read-side API routes
  * (app.py /api/tasks, /api/tools) served from live view DataFrames,
  * re-evaluated per request.
  */
class ViewServerSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def get(url: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("serves task and tool views as JSON and reflects store updates") {
    import spark.implicits._
    var store = TaskStore.empty(spark)
      .upsertTask(TaskRow(1, "analysis", "", "check the spark logs", "", "new", ts(1)))
    val tools = Seq(
      Tool("add", "adds", """{"type":"object","properties":{}}""", "s1", 0),
      Tool("add", "adds v2", """{"type":"object","properties":{}}""", "s2", 1)).toDS()

    val server = new ViewServer(Map(
      "/api/tasks" -> (() => store.tasksView),
      "/api/tools" -> (() => Registry.unionLastWins(tools).toDF())))
    val port = server.start()
    try {
      val (s1, tasksJson) = get(s"http://127.0.0.1:$port/api/tasks")
      assert(s1 == 200 && tasksJson.contains(""""taskId":1"""))
      // title was derived from the target (F9)
      assert(tasksJson.contains(""""title":"""))

      val (s2, toolsJson) = get(s"http://127.0.0.1:$port/api/tools")
      assert(s2 == 200)
      // last-wins union: exactly one `add`, from server s2
      assert(toolsJson.contains(""""server":"s2""""))
      assert(!toolsJson.contains(""""server":"s1""""))

      // the view is a thunk — a store update is visible on next request
      store = store.upsertTask(TaskRow(2, "analysis", "t2", "x", "", "new", ts(2)))
      val (_, tasksJson2) = get(s"http://127.0.0.1:$port/api/tasks")
      assert(tasksJson2.contains(""""taskId":2"""))
    } finally server.close()
  }

  test("a failing view returns a 500 with an error body") {
    val server = new ViewServer(Map(
      "/api/boom" -> (() => spark.sql("SELECT * FROM missing_table_xyz"))))
    val port = server.start()
    try {
      val (status, body) = get(s"http://127.0.0.1:$port/api/boom")
      assert(status == 500 && body.contains("error"))
    } finally server.close()
  }
}
