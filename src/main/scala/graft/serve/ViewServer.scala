package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

/** Minimal REST shim over the engine's view DataFrames — the serving
  * seam for the reference's read-side API routes (app.py:126-481:
  * `/api/tasks`, `/api/memory`, `/api/tools`, ...). The write-side and
  * websocket chat loop stay out of engine scope (SURVEY §2.1), but a
  * user embedding the engine gets its query surface over HTTP with
  * zero extra dependencies (JDK HttpServer).
  *
  * Each route maps to a THUNK returning a DataFrame so every request
  * re-evaluates the view against current store state. Responses are
  * JSON arrays via Spark's own row serializer (`DataFrame.toJSON`).
  * Views served this way must be bounded (they are: registry, task and
  * memory views are per-session aggregates — the same boundedness
  * argument as the reference's in-process dicts); anything unbounded
  * belongs on a sink, not a serving endpoint.
  */
final class ViewServer(routes: Map[String, () => DataFrame]) extends AutoCloseable {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  routes.foreach { case (path, view) =>
    server.createContext(path, (ex: HttpExchange) => {
      val (status, body) =
        try (200, view().toJSON.collect().mkString("[", ",", "]"))
        catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            (500, s"""{"error": "${graft.functions.AgentText.escapeJson(msg)}"}""")
        }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
  }

  def start(): Int = { server.start(); server.getAddress.getPort }

  override def close(): Unit = server.stop(0)
}
