package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Padding-waste audit of batch-formation policies — the step a
  * training-data pipeline runs before fixing its dataloader: fixed-size
  * batches pad every sequence to the batch max, so batch composition
  * alone moves the padding overhead (the motivation for
  * length-grouped batching in every major training stack). The query
  * scores two policies over the corpus at batch size 32:
  *
  *   - `arrival`: batches in doc_id order (the naive loader);
  *   - `length_sorted`: batches in (token_count, doc_id) order — the
  *     classic length-bucketing approximation.
  *
  * Per policy: batch count, real tokens, padded tokens (Σ batch_max ×
  * batch_rows), and the waste fraction. Exact integer token math; the
  * only double is the final ratio.
  *
  * Scale: global order positions come from [[Pipeline.globalRank]]
  * (range-shard + per-shard offsets, one long per shard to the driver
  * — never a single-partition window); batch stats are one groupBy per
  * policy.
  */
object LengthBatching {

  private val BATCH = 32

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_length_batching",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents WHERE text IS NOT NULL),
        ranked AS (
          SELECT doc_id, n_tok,
                 ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS r_arr,
                 ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) - 1 AS r_len
          FROM toks),
        b_arr AS (
          SELECT r_arr // $BATCH AS batch_id,
                 COUNT(*) AS n_docs, MAX(n_tok) AS mx, SUM(n_tok) AS real
          FROM ranked GROUP BY 1),
        b_len AS (
          SELECT r_len // $BATCH AS batch_id,
                 COUNT(*) AS n_docs, MAX(n_tok) AS mx, SUM(n_tok) AS real
          FROM ranked GROUP BY 1),
        pol AS (
          SELECT 'arrival' AS policy,
                 CAST(COUNT(*) AS BIGINT) AS n_batches,
                 CAST(SUM(real) AS BIGINT) AS real_tokens,
                 CAST(SUM(mx * n_docs) AS BIGINT) AS padded_tokens
          FROM b_arr
          UNION ALL
          SELECT 'length_sorted',
                 CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(real) AS BIGINT),
                 CAST(SUM(mx * n_docs) AS BIGINT)
          FROM b_len)
        SELECT policy, n_batches, real_tokens, padded_tokens,
               ${det.sqlSnap9(
        "(padded_tokens - real_tokens) * 1.0 / padded_tokens")} AS waste_pct
        FROM pol
        ORDER BY policy
      """.trim),
      (s, d) => {
        val toks = documents(s, d)
          .filter(col("text").isNotNull)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .localCheckpoint() // ranked twice (two total orders)
        def policy(name: String, order: Seq[org.apache.spark.sql.Column]) =
          Pipeline.globalRank(toks, order)
            .groupBy((col("rank") / BATCH).cast("long").as("batch_id"))
            .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("mx"),
              sum(col("n_tok")).as("real"))
            .agg(count(lit(1)).cast("long").as("n_batches"),
              sum(col("real")).cast("long").as("real_tokens"),
              sum(col("mx") * col("n_docs")).cast("long").as("padded_tokens"))
            .select(lit(name).as("policy"), col("n_batches"),
              col("real_tokens"), col("padded_tokens"))
        policy("arrival", Seq(col("doc_id")))
          .unionAll(policy("length_sorted", Seq(col("n_tok"), col("doc_id"))))
          .select(col("policy"), col("n_batches"), col("real_tokens"),
            col("padded_tokens"),
            det.snap9((col("padded_tokens") - col("real_tokens")) * 1.0
              / col("padded_tokens")).as("waste_pct"))
          .orderBy(col("policy"))
      }))
}
