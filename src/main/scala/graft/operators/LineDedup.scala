package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style span-level exact dedup (Raffel et al. JMLR'20 §2.2 —
  * "we discarded all but one of any three-sentence span occurring
  * more than once"). The benchmark corpus has no sentence
  * punctuation, so the span unit is a fixed 10-word segment: each
  * document is sliced row-locally into consecutive word windows, the
  * corpus-wide segment relation is deduplicated keep-first (global
  * min (doc_id, seg_no) per distinct segment text — deterministic,
  * order-free), and the per-document retention accounting comes back
  * out. This is the intra-/inter-document boilerplate-span removal
  * pass that runs AFTER whole-doc dedup in a crawl pipeline: exact
  * whole-doc dedup ([[Dedup]] `dd_exact_documents`) misses documents
  * that share paragraphs without being near-identical.
  *
  * Dataflow: one row-local explode (sequence + slice — no
  * collect_list ordering hazards), then a single hash shuffle
  * partitioned BY SEGMENT TEXT for the keep-first window, then the
  * per-doc groupBy. At 100 TB the segment relation is ~n_tokens/10
  * rows and every stage is key-partitioned; nothing touches the
  * driver and no operator is quadratic. The heavy-hitter segment
  * ("" boilerplate repeated millions of times) lands in one window
  * partition — real pipelines pre-aggregate by (segment, doc-range)
  * if one span dominates; on this corpus max multiplicity is
  * bounded and AQE's skew handling covers the gap.
  */
object LineDedup {

  private val segWords = 10

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dd_span_dedup",
      Some(s"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
        segs AS (
          SELECT doc_id, t.seg_no,
                 array_to_string(list_slice(wl, t.seg_no*$segWords+1, t.seg_no*$segWords+$segWords), ' ') AS seg
          FROM w, UNNEST(generate_series(0, CAST((len(wl)-1)//$segWords AS BIGINT))) AS t(seg_no)),
        r AS (SELECT doc_id, seg_no,
                ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
              FROM segs)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_seg,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM r GROUP BY doc_id ORDER BY doc_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = documents(s, d).select($"doc_id", split($"text", " ").as("wl"))
        val segs = w
          .select($"doc_id", $"wl",
            explode(sequence(lit(0L),
              ((size($"wl") - 1) / segWords).cast("long"))).as("seg_no"))
          .select($"doc_id", $"seg_no",
            array_join(slice($"wl", ($"seg_no" * segWords + 1).cast("int"),
              lit(segWords)), " ").as("seg"))
        val keepFirst = Window.partitionBy($"seg").orderBy($"doc_id", $"seg_no")
        segs
          .withColumn("rn", row_number().over(keepFirst))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_seg"),
            sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_kept"))
          .orderBy($"doc_id")
      }))
}
