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

  /** Content-defined chunks of a (doc_id, text) frame: one row per
    * chunk with its content hash and token length. Boundaries open at
    * position 1 and wherever the token's portable hash ≡ 0 (mod 16) —
    * content-addressed, so an insertion shifts only the chunks it
    * touches. Exposed for the shift-tolerance property spec. */
  def cdcChunks(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pos = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "tok")))
      .select(col("doc_id"), (col("p") + 1).as("i"), col("tok"))
    val b = pos.withColumn("boundary",
      when(col("i") === 1 || PortableHash.h32(col("tok")) % 16 === 0, 1).otherwise(0))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("chunk_no", sum(col("boundary")).over(w))
      .groupBy(col("doc_id"), col("chunk_no"))
      .agg(sort_array(collect_list(struct(col("i"), col("tok")))).as("st"),
        count(lit(1)).as("chunk_len"))
      .select(col("doc_id"), col("chunk_no"), col("chunk_len"),
        md5(array_join(transform(col("st"), x => x.getField("tok")), " ")).as("h"))
  }

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
        cdcChunks(documents(s, d)).groupBy($"h")
          .agg(count(lit(1)).as("n_copies"),
            countDistinct($"doc_id").as("n_docs"),
            min($"doc_id").as("first_doc"),
            min($"chunk_len").as("chunk_len"))
          .filter($"n_copies" > 1)
          .select($"h", $"n_copies", $"n_docs", $"first_doc", $"chunk_len")
          .orderBy($"h")
      }))
}
