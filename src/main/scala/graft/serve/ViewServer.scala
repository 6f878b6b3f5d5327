package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

/** Minimal REST shim over the engine's view DataFrames — the serving
  * seam for the reference's API routes (app.py:126-481: `/api/tasks`,
  * `/api/memory`, `/api/tools`, ...), now including the write side: a
  * POST route maps to a plain body → JSON handler (see
  * [[ChatService]], the `/api/chat` analog of app.py:396-409). A user
  * embedding the engine gets its query surface over HTTP with zero
  * extra dependencies (JDK HttpServer).
  *
  * Each GET route maps to a THUNK returning a DataFrame so every
  * request re-evaluates the view against current store state.
  * Responses are JSON arrays via Spark's own row serializer
  * (`DataFrame.toJSON`). Views served this way must be bounded (they
  * are: registry, task and memory views are per-session aggregates —
  * the same boundedness argument as the reference's in-process dicts);
  * `rowCap` backstops that contract — an unbounded DataFrame
  * accidentally registered as a route serves its first `rowCap` rows
  * instead of collecting the world into the driver.
  */
final class ViewServer(
    routes: Map[String, () => DataFrame],
    postRoutes: Map[String, String => String] = Map.empty,
    rowCap: Int = 1000) extends AutoCloseable {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def guarded(f: => String): (Int, String) =
    try (200, f)
    catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        (500, s"""{"error": "${graft.functions.AgentText.escapeJson(msg)}"}""")
    }

  routes.foreach { case (path, view) =>
    server.createContext(path, (ex: HttpExchange) => {
      val (status, body) =
        guarded(view().limit(rowCap).toJSON.collect().mkString("[", ",", "]"))
      respond(ex, status, body)
    })
  }

  postRoutes.foreach { case (path, handler) =>
    server.createContext(path, (ex: HttpExchange) => {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error": "POST only"}""")
      else {
        val req = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val (status, body) = guarded(handler(req))
        respond(ex, status, body)
      }
    })
  }

  def start(): Int = { server.start(); server.getAddress.getPort }

  override def close(): Unit = server.stop(0)
}
