package graft.provider

import org.apache.spark.sql.Dataset

/** S8 — the LLM call as a dataflow operator: map a column of prompts
  * through a provider inside `mapPartitions`, one provider instance per
  * partition (the HTTP client and its rate limiter live exactly once
  * per task, never serialized per row, never inside a shuffle).
  *
  * `providerFactory` runs on the executor — pass a constructor, not a
  * live client. Batch size bounds in-flight requests per partition; at
  * cluster scale parallelism = partitions × batchSize concurrent calls,
  * throttled at the factory level.
  */
object LlmMap {

  final case class PromptRow(id: Long, prompt: String)
  final case class CompletionRow(id: Long, prompt: String, completion: String)

  def completePrompts(
      prompts: Dataset[PromptRow],
      providerFactory: () => Provider,
      batchSize: Int = 8): Dataset[CompletionRow] = {
    import prompts.sparkSession.implicits._
    prompts.mapPartitions { rows =>
      val provider = providerFactory()
      rows.grouped(batchSize).flatMap { batch =>
        batch.map(r => CompletionRow(r.id, r.prompt, provider.generateResponse(r.prompt)))
      }
    }
  }
}
