package graft.provider

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import graft.functions.AgentText
import graft.functions.AgentText.{JObj, JStr, JVal, JBool, JArr}
import scala.collection.immutable.ListMap

/** Concrete HTTP adapters for the [[Provider]] seam — the reference's
  * provider surface (provider.py:33-257) re-expressed over JDK 17's
  * `java.net.http` so a user can point the engine at a real endpoint
  * with zero extra dependencies. All three share the reference's
  * contract: `generateResponse(prompt) -> String`, empty string on a
  * non-200 response (the reference logs and returns None), and a
  * 180-second timeout (the reference's only latency constant,
  * provider.py/manager.py).
  *
  * Dataflow use: construct INSIDE `mapPartitions` via
  * [[LlmMap.completePrompts]]'s factory — the client lives once per
  * task and is never serialized (it is `@transient lazy`).
  */
object HttpProviders {

  private[provider] def field(v: JVal, key: String): Option[JVal] = v match {
    case JObj(fields) => fields.collectFirst { case (k, x) if k == key => x }
    case _ => None
  }

  private[provider] def str(v: JVal): Option[String] = v match {
    case JStr(s) => Some(s)
    case _ => None
  }

  private[provider] def index(v: JVal, i: Int): Option[JVal] = v match {
    case JArr(items) if items.length > i => Some(items(i))
    case _ => None
  }
}

/** Base plumbing: one lazily-built JDK HTTP client per instance (and,
  * via the mapPartitions factory, per task). */
sealed abstract class HttpProviderBase(timeoutSeconds: Long) extends Provider {
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds))
    .build()

  /** Transport failures (connect/read timeout, reset, interrupt) map to
    * status -1 — generateResponse then yields "" like any non-200, so a
    * single bad call inside a mapPartitions task costs one empty row,
    * not 4 task retries re-billing the whole partition. */
  protected final def post(url: String, body: String, headers: Seq[(String, String)]): (Int, String) =
    try {
      val builder = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(timeoutSeconds))
        .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      headers.foreach { case (k, v) => builder.header(k, v) }
      val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    } catch {
      case e: InterruptedException => Thread.currentThread().interrupt(); (-1, "")
      case scala.util.control.NonFatal(_) => (-1, "")
    }

  protected final def get(url: String): (Int, String) =
    try {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(timeoutSeconds)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    } catch {
      case e: InterruptedException => Thread.currentThread().interrupt(); (-1, "")
      case scala.util.control.NonFatal(_) => (-1, "")
    }
}

/** OpenAI-compatible chat-completions adapter (provider.py OpenProvider
  * / OpenAIProvider, lines 81-257): POST `{model, messages:[{role:
  * user, content: prompt}], stream: false}` to
  * `<base>/chat/completions` with a Bearer key; the reply is
  * `choices[0].message.content`, falling back to `reasoning_content`
  * exactly as the reference does. */
final class OpenCompatProvider(
    baseUrl: String, model: String, apiKey: String,
    timeoutSeconds: Long = 180L) extends HttpProviderBase(timeoutSeconds) {
  import HttpProviders._

  def generateResponse(prompt: String): String = {
    val payload = AgentText.renderJson(JObj(ListMap(
      "model" -> JStr(model),
      "messages" -> JArr(Vector(JObj(ListMap(
        "role" -> JStr("user"), "content" -> JStr(prompt))))),
      "stream" -> JBool(false))))
    val (status, body) = post(
      AgentText.robustUrlJoin(baseUrl, "chat/completions"), payload,
      Seq("Authorization" -> s"Bearer $apiKey", "Content-Type" -> "application/json"))
    if (status != 200) ""
    else {
      val parsed = AgentText.parseJson5ish(body)
      val message = parsed
        .flatMap(field(_, "choices")).flatMap(index(_, 0))
        .flatMap(field(_, "message"))
      message.flatMap(field(_, "content")).flatMap(str)
        .orElse(message.flatMap(field(_, "reasoning_content")).flatMap(str))
        .getOrElse("")
    }
  }
}

/** Ollama-style adapter (provider.py OllamaProvider, lines 48-76):
  * POST `{model, prompt, stream: false}` to `<base>/api/generate`; the
  * reply is the `response` field. */
final class OllamaStyleProvider(
    baseUrl: String, model: String,
    timeoutSeconds: Long = 180L) extends HttpProviderBase(timeoutSeconds) {
  import HttpProviders._

  def generateResponse(prompt: String): String = {
    val payload = AgentText.renderJson(JObj(ListMap(
      "model" -> JStr(model),
      "prompt" -> JStr(prompt),
      "stream" -> JBool(false))))
    val (status, body) = post(
      AgentText.robustUrlJoin(baseUrl, "api/generate"), payload,
      Seq("Content-Type" -> "application/json"))
    if (status != 200) ""
    else AgentText.parseJson5ish(body)
      .flatMap(field(_, "response")).flatMap(str).getOrElse("")
  }
}

/** Messages-API adapter with a SEPARATE top-level system prompt and a
  * content-BLOCK response (the reference's fourth transport shape,
  * provider.py:80-141): POST `{model, max_tokens, system?, messages:
  * [{role: user, content: prompt}]}` to `<base>/v1/messages`, auth via
  * a bare `x-api-key` header plus a version header (not a Bearer
  * token); the reply is the concatenation of `content[i].text` over
  * blocks with `type == "text"`. A distinct request/response geometry
  * from the chat-completions family: system rides a top-level field,
  * and the answer is a typed block LIST, not a single message
  * object. */
final class MessagesBlockProvider(
    baseUrl: String, model: String, apiKey: String,
    system: String = "", maxTokens: Int = 1024,
    version: String = "2023-06-01",
    timeoutSeconds: Long = 180L) extends HttpProviderBase(timeoutSeconds) {
  import HttpProviders._
  import graft.functions.AgentText.JNum

  def generateResponse(prompt: String): String = {
    val base = ListMap(
      "model" -> JStr(model),
      "max_tokens" -> (JNum(maxTokens): JVal),
      "messages" -> JArr(Vector(JObj(ListMap(
        "role" -> JStr("user"), "content" -> JStr(prompt))))))
    val payload = AgentText.renderJson(JObj(
      if (system.nonEmpty) base + ("system" -> (JStr(system): JVal)) else base))
    val (status, body) = post(
      AgentText.robustUrlJoin(baseUrl, "v1/messages"), payload,
      Seq("x-api-key" -> apiKey, "anthropic-version" -> version,
        "Content-Type" -> "application/json"))
    if (status != 200) ""
    else AgentText.parseJson5ish(body).flatMap(field(_, "content")) match {
      case Some(JArr(blocks)) =>
        blocks.flatMap { b =>
          if (field(b, "type").flatMap(str).contains("text"))
            field(b, "text").flatMap(str)
          else None
        }.mkString
      case _ => ""
    }
  }
}

/** Plain-text GET adapter (provider.py PollinationsProvider, lines
  * 33-46): GET `<base>/<urlencoded prompt>`, the body IS the reply. */
final class TextGetProvider(
    baseUrl: String,
    timeoutSeconds: Long = 180L) extends HttpProviderBase(timeoutSeconds) {
  def generateResponse(prompt: String): String = {
    val encoded = java.net.URLEncoder.encode(prompt, "UTF-8").replace("+", "%20")
    // Plain concatenation, exactly the reference's f"{base}/{quote(p)}"
    // — routing the pre-encoded path through a URI constructor would
    // re-quote the '%' and double-encode the prompt.
    val (status, body) = get(s"${baseUrl.stripSuffix("/")}/$encoded")
    if (status != 200) "" else body
  }
}
