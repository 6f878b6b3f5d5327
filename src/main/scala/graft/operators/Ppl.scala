package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** CCNet-style perplexity filtering (Wenzek et al. 2020): score every
  * document with a small LM, split the corpus into head/middle/tail
  * perplexity tertiles, and report the bucket composition per source —
  * the standard quality gate that keeps "head" (fluent) text and
  * down-samples the noisy tail.
  *
  * The LM is the engine's own add-one bigram model (ta_bigram_xent),
  * trained on the 90% doc_id split and scoring EVERY document with
  * ≥1 bigram. Per-doc bits are exact integers (the floor(log2) of an
  * exact count rational per bigram — the proven-portable surprisal
  * recipe), so bits-per-token is a ratio of exact integers and the
  * tertile order (bpt, doc_id) is deterministic across engines.
  *
  * Scale: bigram explode is row-local; model joins are on natural
  * keys; the global tertile rank uses range-sharded ranks
  * ([[Pipeline.globalRank]] — per-shard offsets, one long per shard to
  * the driver), NEVER a single-partition window; the readout is a
  * bounded (source × 3) aggregate.
  */
object Ppl {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "pl_ppl_filter",
      Some("""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        bg AS (
          SELECT doc_id, source, tk[i] AS prev, tk[i + 1] AS next
          FROM (SELECT doc_id, source, tk, unnest(range(1, len(tk))) AS i FROM toks)),
        cw AS (
          SELECT prev, next, COUNT(*) AS c
          FROM bg WHERE doc_id % 10 <> 0 GROUP BY prev, next),
        cc AS (SELECT prev, SUM(c) AS ctx FROM cw GROUP BY prev),
        v AS (SELECT COUNT(DISTINCT next) AS v FROM cw),
        doc AS (
          SELECT b.doc_id, b.source,
                 COUNT(*) AS n_bg,
                 SUM(CAST(floor(log2(
                   CAST(COALESCE(cc.ctx, 0) + v.v AS DOUBLE)
                     / (COALESCE(cw.c, 0) + 1))) AS BIGINT)) AS bits
          FROM bg b
          LEFT JOIN cw ON cw.prev = b.prev AND cw.next = b.next
          LEFT JOIN cc ON cc.prev = b.prev
          CROSS JOIN v
          GROUP BY b.doc_id, b.source),
        ranked AS (
          SELECT source, n_bg, bits,
                 row_number() OVER (ORDER BY bits * 1.0 / n_bg, doc_id) AS rk,
                 COUNT(*) OVER () AS n
          FROM doc),
        bucketed AS (
          SELECT source,
                 CASE WHEN rk <= n // 3 THEN 'head'
                      WHEN rk <= (2 * n) // 3 THEN 'middle'
                      ELSE 'tail' END AS bucket,
                 n_bg, bits
          FROM ranked)
        SELECT source, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(bits) AS BIGINT) AS total_bits,
               CAST(SUM(n_bg) AS BIGINT) AS total_bigrams,
               CAST(SUM(bits) AS DOUBLE) / SUM(n_bg) AS bits_per_token
        FROM bucketed
        GROUP BY source, bucket
        ORDER BY source, bucket
      """.trim),
      (s, d) => {
        import s.implicits._
        val bg = documents(s, d)
          .select($"doc_id", $"source", split($"text", " ").as("tk"))
          .filter(size($"tk") >= 2)
          .select($"doc_id", $"source", explode(transform(
            sequence(lit(0), size($"tk") - 2),
            i => struct(element_at($"tk", i + 1).as("prev"),
              element_at($"tk", i + 2).as("next")))).as("p"))
          .select($"doc_id", $"source", $"p.prev".as("prev"), $"p.next".as("next"))
          .localCheckpoint()
        val cw = bg.filter($"doc_id" % 10 =!= 0)
          .groupBy($"prev", $"next").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val cc = cw.groupBy($"prev").agg(sum($"c").as("ctx"))
        val v = cw.agg(countDistinct($"next").as("v"))
        val doc = bg
          .join(cw, Seq("prev", "next"), "left")
          .join(cc.withColumnRenamed("prev", "cprev"), $"cprev" === $"prev", "left")
          .crossJoin(broadcast(v))
          .groupBy($"doc_id", $"source")
          .agg(count(lit(1)).as("n_bg"),
            sum(floor(log2((coalesce($"ctx", lit(0)) + $"v").cast("double") /
              (coalesce($"c", lit(0)) + 1))).cast("long")).as("bits"))
        val n = doc.agg(count(lit(1)).as("n"))
        val ranked = Pipeline.globalRank(
            doc.withColumn("bpt", $"bits" * lit(1.0) / $"n_bg"),
            Seq($"bpt", $"doc_id"))
          .withColumn("rk", $"rank" + 1)
          .crossJoin(broadcast(n))
        ranked
          .select($"source",
            when($"rk" <= expr("n DIV 3"), "head")
              .when($"rk" <= expr("(2 * n) DIV 3"), "middle")
              .otherwise("tail").as("bucket"),
            $"n_bg", $"bits")
          .groupBy($"source", $"bucket")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum($"bits").cast("long").as("total_bits"),
            sum($"n_bg").cast("long").as("total_bigrams"),
            (sum($"bits").cast("double") / sum($"n_bg")).as("bits_per_token"))
          .orderBy($"source", $"bucket")
      }))
}
