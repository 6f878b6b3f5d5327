package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) dedup at token granularity — the
  * rsync/LBFS boundary trick applied to text: a chunk boundary opens
  * wherever the token's content hash hits `h % 16 == 0`, so inserting
  * or deleting a sentence shifts only the chunks it touches, where
  * pl_paragraph_dedup's FIXED 64-token windows re-align every chunk
  * after the edit and miss all the unchanged repeats. The cross-corpus
  * rollup on the chunk content hash then finds shift-tolerant repeated
  * blocks (quoted passages, mirrored sections, boilerplate).
  *
  * Dataflow: one posexplode (row-local), one per-doc window for the
  * running boundary count (partitioned by doc_id — never global), one
  * (doc, chunk) sort-free rollup via sorted-struct aggregation, one
  * corpus-wide hash groupBy. Everything is keyed; nothing driver-side.
  */
object Cdc {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dd_cdc_chunks",
      Some(s"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        pos AS (
          SELECT doc_id, toks,
                 UNNEST(range(1, len(toks) + 1)) AS i
          FROM t),
        b AS (
          SELECT doc_id, i, toks[i] AS tok,
                 CASE WHEN i = 1 OR ${PortableHash.sqlH32("toks[i]")} % 16 = 0
                      THEN 1 ELSE 0 END AS boundary
          FROM pos),
        ch AS (
          SELECT doc_id, i, tok,
                 SUM(boundary) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_no
          FROM b),
        chunks AS (
          SELECT doc_id, chunk_no,
                 md5(string_agg(tok, ' ' ORDER BY i)) AS h,
                 COUNT(*) AS chunk_len
          FROM ch GROUP BY doc_id, chunk_no)
        SELECT h,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               MIN(doc_id) AS first_doc,
               CAST(MIN(chunk_len) AS BIGINT) AS chunk_len
        FROM chunks
        GROUP BY h
        HAVING COUNT(*) > 1
        ORDER BY h
      """.trim),
      (s, d) => {
        import s.implicits._
        val pos = documents(s, d)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p", "tok")))
          .select($"doc_id", ($"p" + 1).as("i"), $"tok")
        val b = pos.withColumn("boundary",
          when($"i" === 1 || PortableHash.h32($"tok") % 16 === 0, 1).otherwise(0))
        val w = Window.partitionBy($"doc_id").orderBy($"i")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ch = b.withColumn("chunk_no", sum($"boundary").over(w))
        val chunks = ch.groupBy($"doc_id", $"chunk_no")
          .agg(sort_array(collect_list(struct($"i", $"tok"))).as("st"),
            count(lit(1)).as("chunk_len"))
          .select($"doc_id", $"chunk_no", $"chunk_len",
            md5(array_join(transform($"st", x => x.getField("tok")), " ")).as("h"))
        chunks.groupBy($"h")
          .agg(count(lit(1)).as("n_copies"),
            countDistinct($"doc_id").as("n_docs"),
            min($"doc_id").as("first_doc"),
            min($"chunk_len").as("chunk_len"))
          .filter($"n_copies" > 1)
          .select($"h", $"n_copies", $"n_docs", $"first_doc", $"chunk_len")
          .orderBy($"h")
      }))
}
