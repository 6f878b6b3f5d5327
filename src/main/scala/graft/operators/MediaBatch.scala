package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Media batching plumbing: aspect-ratio bucketing (the padding-waste
  * killer for image training batches) and energy-threshold segment
  * extraction (the VAD shape every audio ingest runs). Both consume
  * the portable fake decode (`mm_media_meta`'s md5-derived metadata /
  * per-token energies) so the oracle can replay them relationally; a
  * real pipeline swaps the decode seam and keeps everything downstream.
  */
object MediaBatch {

  val defs: Seq[QueryDef] = Seq(
    // Aspect-ratio bucketing: group images by shape class, size each
    // bucket's batch canvas at its max dims, and price the padding
    // waste (1 − Σ pixel area / canvas area). Loaders bucket by
    // aspect so a batch shares one canvas — the waste column is the
    // number this query exists to drive down. Bucket edges compare
    // integer cross-products (w·10 vs h·6), never a float ratio, so
    // the classification is exact in both engines. One row-local
    // projection + one groupBy — no shuffle wider than |buckets|.
    QueryDef(
      "mm_aspect_bucketing", {
        val h = "CAST(('0x' || substr(md5(text), 1, 8))::UBIGINT AS BIGINT)"
        Some(s"""
          WITH m AS (
            SELECT doc_id,
                   16 * (1 + ($h // 65536) % 64) AS w,
                   16 * (1 + $h % 64) AS h
            FROM documents),
          b AS (
            SELECT doc_id, w, h,
                   CASE WHEN w * 10 < h * 6 THEN 'tall'
                        WHEN w * 10 < h * 9 THEN 'portrait'
                        WHEN w * 10 <= h * 12 THEN 'square'
                        WHEN w * 10 <= h * 17 THEN 'landscape'
                        ELSE 'wide' END AS bucket
            FROM m)
          SELECT bucket,
                 CAST(COUNT(*) AS BIGINT) AS n_images,
                 CAST(MAX(w) AS BIGINT) AS canvas_w,
                 CAST(MAX(h) AS BIGINT) AS canvas_h,
                 CAST(SUM(w * h) AS BIGINT) AS pixel_area,
                 floor((1.0 - SUM(w * h) * 1.0 / (COUNT(*) * MAX(w) * MAX(h)))
                       * 1000000000 + 0.5) / 1000000000 AS pad_waste
          FROM b GROUP BY bucket
          ORDER BY bucket
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val h32 = PortableHash.h32($"text")
        val m = documents(s, d).select(
          $"doc_id",
          (lit(16) * (lit(1) + (h32.divide(lit(65536L)).cast("long")) % 64)).as("w"),
          (lit(16) * (lit(1) + h32 % 64)).as("h"))
        val b = m.withColumn("bucket",
          when($"w" * 10 < $"h" * 6, "tall")
            .when($"w" * 10 < $"h" * 9, "portrait")
            .when($"w" * 10 <= $"h" * 12, "square")
            .when($"w" * 10 <= $"h" * 17, "landscape")
            .otherwise("wide"))
        b.groupBy($"bucket")
          .agg(count(lit(1)).as("n_images"),
            max($"w").cast("long").as("canvas_w"),
            max($"h").cast("long").as("canvas_h"),
            sum($"w" * $"h").cast("long").as("pixel_area"))
          .select($"bucket", $"n_images", $"canvas_w", $"canvas_h", $"pixel_area",
            (floor((lit(1.0) - $"pixel_area" * lit(1.0)
              / ($"n_images" * $"canvas_w" * $"canvas_h"))
              * lit(1000000000L) + lit(0.5)) / lit(1000000000L)).as("pad_waste"))
          .orderBy($"bucket")
      }),

    // Energy-threshold segmentation (the VAD shape): each doc's tokens
    // stand in for audio frames with a portable per-frame energy; a
    // segment is a maximal run of frames at/above the gate. Classic
    // gaps-and-islands — the island key is pos − row_number within
    // (doc, active), one window pass + one rollup, all partitioned by
    // doc (row-local at any corpus size; no cross-doc state). Output:
    // per-doc frame/segment accounting a downstream clipper consumes.
    QueryDef(
      "mm_energy_segments", {
        val e = PortableHash.sqlH32("x")
        Some(s"""
          WITH tk AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents),
          f AS (
            SELECT doc_id,
                   unnest(range(1, len(t) + 1)) AS pos,
                   unnest(list_transform(t,
                     x -> CASE WHEN $e % 100 >= 40 THEN 1 ELSE 0 END)) AS act
            FROM tk),
          g AS (
            SELECT doc_id, pos, act,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id, act
                                            ORDER BY pos) AS grp
            FROM f),
          runs AS (
            SELECT doc_id, act, CAST(COUNT(*) AS BIGINT) AS seg_len
            FROM g GROUP BY doc_id, act, grp),
          per AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_seg,
                   MAX(seg_len) AS longest_seg
            FROM runs WHERE act = 1 GROUP BY doc_id),
          tot AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
                   CAST(SUM(act) AS BIGINT) AS n_active
            FROM f GROUP BY doc_id)
          SELECT t.doc_id, t.n_frames, t.n_active,
                 COALESCE(p.n_seg, 0) AS n_seg,
                 COALESCE(p.longest_seg, 0) AS longest_seg
          FROM tot t LEFT JOIN per p ON t.doc_id = p.doc_id
          ORDER BY t.doc_id
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val f = documents(s, d)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p0", "tok")))
          .select($"doc_id", ($"p0" + 1).as("pos"),
            when(PortableHash.h32($"tok") % 100 >= 40, 1L).otherwise(0L).as("act"))
        val g = f.withColumn("grp",
          $"pos" - row_number().over(
            Window.partitionBy($"doc_id", $"act").orderBy($"pos")))
        val runs = g.groupBy($"doc_id", $"act", $"grp")
          .agg(count(lit(1)).as("seg_len"))
        val per = runs.filter($"act" === 1L)
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_seg"), max($"seg_len").as("longest_seg"))
        val tot = f.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_frames"), sum($"act").as("n_active"))
        tot.join(per, Seq("doc_id"), "left")
          .select($"doc_id", $"n_frames", $"n_active",
            coalesce($"n_seg", lit(0L)).as("n_seg"),
            coalesce($"longest_seg", lit(0L)).as("longest_seg"))
          .orderBy($"doc_id")
      }))
}
