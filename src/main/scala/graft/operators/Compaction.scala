package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-files compaction planner — the lakehouse OPTIMIZE/bin-pack
  * step: assign documents, in stable (source, doc_id) order, to
  * contiguous output files of ~targetTokens each. Assignment is
  * next-fit by START offset (`file_id = start_off div target`), so a
  * file is a contiguous doc range that begins below each target
  * boundary and may overrun it by at most one document — the
  * standard compaction contract (files are ≥ target until the last,
  * never split a row group mid-document).
  *
  * Scale shape: the per-source running offset comes from ONE global
  * range-sharded running sum over (source, doc_id)
  * ([[Pipeline.globalRunningSum]] — driver traffic is one long per
  * shard), NOT a per-source window: at 100 TB a single source can be
  * most of the corpus, and `PARTITION BY source` would put it in one
  * task. The per-source base offsets that convert the global prefix
  * into within-source offsets are a |sources|-row aggregate (tiny,
  * broadcast). The oracle states the same plan as the per-source
  * window directly — at sf0.01 that is DuckDB's privilege.
  */
object Compaction {

  private val targetTokens = 500L

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_compaction_plan",
      Some(s"""
        WITH toks AS (
          SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
          FROM documents),
        rs AS (
          SELECT doc_id, source, tok_cnt,
                 SUM(tok_cnt) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok_cnt AS start_off
          FROM toks),
        f AS (SELECT source, doc_id, tok_cnt, start_off // $targetTokens AS file_id FROM rs)
        SELECT source, CAST(file_id AS BIGINT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tok_cnt) AS BIGINT) AS tok_sum,
               MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        FROM f GROUP BY source, file_id ORDER BY source, file_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val toks = documents(s, d)
          .select($"doc_id", $"source",
            size(split($"text", " ")).cast("long").as("tok_cnt"))
        val withRun = Pipeline.globalRunningSum(toks,
          Seq(col("source"), col("doc_id")), col("tok_cnt"))
        // |sources| rows: exclusive prefix of source totals in the SAME
        // (source) order the global sum ranges over. Single-partition
        // window over a bounded-cardinality aggregate — not a scale risk.
        val srcBase = toks.groupBy($"source").agg(sum($"tok_cnt").as("t"))
          .withColumn("src_base",
            coalesce(sum($"t").over(Window.orderBy($"source")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select($"source", $"src_base")
        withRun
          .join(broadcast(srcBase), Seq("source"))
          .withColumn("start_off", $"run_sum" - $"tok_cnt" - $"src_base")
          .withColumn("file_id", expr(s"start_off div $targetTokens"))
          .groupBy($"source", $"file_id")
          .agg(count(lit(1)).as("n_docs"),
            sum($"tok_cnt").as("tok_sum"),
            min($"doc_id").as("first_doc"),
            max($"doc_id").as("last_doc"))
          .orderBy($"source", $"file_id")
      }))
}
