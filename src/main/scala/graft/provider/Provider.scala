package graft.provider

/** The LLM-call seam (SURVEY.md §2.1 S8; reference provider.py defines
  * 6 HTTP adapters behind `generate_response(prompt) -> str`). The
  * dataflow never sees transport details: production impls wrap an HTTP
  * client and are invoked inside `mapPartitions` with bounded batch
  * concurrency (never inside a shuffle boundary); tests use the
  * deterministic stub so every pipeline is reproducible.
  */
trait Provider extends Serializable {
  def generateResponse(prompt: String): String
}

/** Deterministic stub: replays canned completions by matching prompt
  * substrings, with a default response. The only nondeterminism source
  * in the reference is the LLM call — replacing it makes the whole §3.1
  * lifecycle a pure function of inputs. */
final class StubProvider(
    canned: Seq[(String, String)],
    default: String = """```json
{"text": "ok", "finished": true}
```""") extends Provider {
  def generateResponse(prompt: String): String =
    canned.collectFirst { case (k, v) if prompt.contains(k) => v }
      .getOrElse(default)
}

/** Echo stub for batch map tests: marks each prompt deterministically. */
object IdentityProvider extends Provider {
  def generateResponse(prompt: String): String = s"echo:${prompt.hashCode}:$prompt"
}
