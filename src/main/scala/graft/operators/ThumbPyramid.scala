package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Thumbnail mip-pyramid over REAL decoded rasters — the resize stage
  * of a multimodal ingest, done on actual pixels instead of the fake
  * decoder's metadata math: encode the hash-synth raster as a real BMP,
  * structurally decode it, then build two pyramid levels by exact
  * integer 2x2 box filtering (each level-k pixel = floor(mean of its
  * four level-(k-1) pixels), per channel — successive halving, NOT a
  * one-shot 4x average, which differs under floor and is pinned by the
  * oracle). Per-level channel sums + a positionally-weighted witness
  * catch any offset/stride slip in the downsample loops.
  *
  * The oracle rebuilds the same pyramid arithmetic formula-side
  * (grouped integer sums with floor division, level 2 derived from
  * level 1's already-floored values). Everything is integer-exact —
  * no doubles anywhere.
  *
  * Scale: decode + pyramid is partition-local per payload; pixels
  * never shuffle; the census is one tiny groupBy-free union ordered at
  * the end. Reference scope: the reference has no media handling —
  * 100 TB multimodal-curation family. */
object ThumbPyramid {

  /** Dims divisible by 4 so two halvings stay exact: 8x8 or 16x8. */
  private[graft] def synthW(d: Long): Int = (8 * (1 + d % 2)).toInt
  private val H = 8

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("level", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("wsum", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_thumb_pyramid", {
        def h(c: Int) = PortableHash.sqlH32(s"doc_id || ':' || x || ':' || y || ':' || $c")
        Some(s"""
          WITH g AS (
            SELECT doc_id, CAST(8 * (1 + doc_id % 2) AS BIGINT) AS w,
                   CAST($H AS BIGINT) AS h
            FROM documents),
          xs AS (SELECT doc_id, h, UNNEST(range(0, w)) AS x FROM g),
          p0 AS (
            SELECT doc_id, x, UNNEST(range(0, h)) AS y,
                   ${h(0)} % 256 AS r, ${h(1)} % 256 AS g2, ${h(2)} % 256 AS b
            FROM xs),
          p1 AS (
            SELECT doc_id, x // 2 AS x, y // 2 AS y,
                   SUM(r) // 4 AS r, SUM(g2) // 4 AS g2, SUM(b) // 4 AS b
            FROM p0 GROUP BY doc_id, x // 2, y // 2),
          p2 AS (
            SELECT doc_id, x // 2 AS x, y // 2 AS y,
                   SUM(r) // 4 AS r, SUM(g2) // 4 AS g2, SUM(b) // 4 AS b
            FROM p1 GROUP BY doc_id, x // 2, y // 2),
          lv AS (
            SELECT doc_id, 0 AS level, x, y, r, g2, b FROM p0
            UNION ALL SELECT doc_id, 1, x, y, r, g2, b FROM p1
            UNION ALL SELECT doc_id, 2, x, y, r, g2, b FROM p2),
          feat AS (
            SELECT doc_id, level,
                   CAST(SUM(r) AS BIGINT) AS sum_r,
                   CAST(SUM(g2) AS BIGINT) AS sum_g,
                   CAST(SUM(b) AS BIGINT) AS sum_b,
                   CAST(SUM((x + 1) * (y + 1) * (r + 2 * g2 + 3 * b)) AS BIGINT)
                     AS wsum
            FROM lv GROUP BY doc_id, level)
          SELECT f.doc_id, CAST(f.level AS BIGINT) AS level,
                 CAST(g.w // CASE f.level WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS BIGINT) AS width,
                 CAST(g.h // CASE f.level WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS BIGINT) AS height,
                 f.sum_r, f.sum_g, f.sum_b, f.wsum
          FROM feat f JOIN g USING (doc_id)
          ORDER BY f.doc_id, f.level
        """.trim)
      },
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.flatMap { row =>
            val id = row.getLong(0)
            val w = synthW(id); val h = H
            val rgb = new Array[Int](w * h * 3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = (y * w + x) * 3
                rgb(p) = BmpMedia.synthChan(id, x, y, 0) & 0xff
                rgb(p + 1) = BmpMedia.synthChan(id, x, y, 1) & 0xff
                rgb(p + 2) = BmpMedia.synthChan(id, x, y, 2) & 0xff
                x += 1
              }
              y += 1
            }
            // real container round trip before any pixel math
            val bmp = BmpMedia.BmpCodec.decode(BmpMedia.BmpCodec.encode(w, h,
              rgb.map(_.toByte)))
            var cur = Array.tabulate(w * h * 3)(i => bmp.rgb(i) & 0xff)
            var cw = w; var ch = h
            (0 to 2).map { level =>
              if (level > 0) {
                val nw = cw / 2; val nh = ch / 2
                val nxt = new Array[Int](nw * nh * 3)
                var yy = 0
                while (yy < nh) {
                  var xx = 0
                  while (xx < nw) {
                    var c = 0
                    while (c < 3) {
                      val s4 = cur(((2 * yy) * cw + 2 * xx) * 3 + c) +
                        cur(((2 * yy) * cw + 2 * xx + 1) * 3 + c) +
                        cur(((2 * yy + 1) * cw + 2 * xx) * 3 + c) +
                        cur(((2 * yy + 1) * cw + 2 * xx + 1) * 3 + c)
                      nxt((yy * nw + xx) * 3 + c) = s4 / 4
                      c += 1
                    }
                    xx += 1
                  }
                  yy += 1
                }
                cur = nxt; cw = nw; ch = nh
              }
              var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
              var yy = 0
              while (yy < ch) {
                var xx = 0
                while (xx < cw) {
                  val p = (yy * cw + xx) * 3
                  sr += cur(p); sg += cur(p + 1); sb += cur(p + 2)
                  ws += (xx + 1).toLong * (yy + 1).toLong *
                    (cur(p) + 2 * cur(p + 1) + 3 * cur(p + 2))
                  xx += 1
                }
                yy += 1
              }
              Row(id, level.toLong, cw.toLong, ch.toLong, sr, sg, sb, ws)
            }
          }
        }
        s.createDataFrame(rdd, schema).orderBy(col("doc_id"), col("level"))
      }))
}
