package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Letterbox / pillarbox border detection over REAL decoded BMP
  * pixels — the crop-planning step before an image model pass:
  * count the uniform-color rows at the top and bottom of each raster
  * (a row is uniform when every pixel equals its first) and report
  * the content window. The fixture PLANTS borders (doc_id % 3 black
  * rows on top, doc_id % 2 at the bottom, painted into the raster
  * before the real BMP encode) so the detector has ground truth to
  * localize — and a decode bug that flips row order swaps the two
  * border counts and fails the hash.
  *
  * Determinism: pure integer pixel comparisons on exactly mirrored
  * synth pixels.
  *
  * Scale: pure map stage — decode + the border scan are
  * partition-local; payloads never shuffle.
  */
object Letterbox {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("height", LongType),
    StructField("top_border", LongType),
    StructField("bottom_border", LongType),
    StructField("content_rows", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_letterbox", {
        def hch(c: Int) = PortableHash.sqlH32(s"doc_id || ':' || x || ':' || y || ':' || $c")
        Some(s"""
        WITH g AS (
          SELECT doc_id,
                 CAST(8 + doc_id % 9 AS BIGINT) AS w,
                 CAST(4 + doc_id % 5 AS BIGINT) AS h,
                 CAST(doc_id % 3 AS BIGINT) AS n_top,
                 CAST(doc_id % 2 AS BIGINT) AS n_bot
          FROM documents),
        xs AS (SELECT doc_id, w, h, n_top, n_bot, UNNEST(range(0, w)) AS x FROM g),
        ps AS (SELECT doc_id, w, h, n_top, n_bot, x, UNNEST(range(0, h)) AS y FROM xs),
        px AS (
          SELECT doc_id, h, y,
                 CASE WHEN y < n_top OR y >= h - n_bot THEN 0
                      ELSE ${hch(0)} % 256 END AS r,
                 CASE WHEN y < n_top OR y >= h - n_bot THEN 0
                      ELSE ${hch(1)} % 256 END AS g2,
                 CASE WHEN y < n_top OR y >= h - n_bot THEN 0
                      ELSE ${hch(2)} % 256 END AS b
          FROM ps),
        rowu AS (
          SELECT doc_id, h, y,
                 CASE WHEN COUNT(DISTINCT (r, g2, b)) = 1 THEN 1 ELSE 0 END
                   AS uniform
          FROM px GROUP BY doc_id, h, y),
        nonuni AS (
          SELECT doc_id, MAX(h) AS h,
                 MIN(CASE WHEN uniform = 0 THEN y END) AS first_c,
                 MAX(CASE WHEN uniform = 0 THEN y END) AS last_c
          FROM rowu GROUP BY doc_id)
        SELECT doc_id, h AS height,
               CAST(COALESCE(first_c, h) AS BIGINT) AS top_border,
               CAST(COALESCE(h - 1 - last_c, h) AS BIGINT) AS bottom_border,
               CAST(COALESCE(last_c - first_c + 1, 0) AS BIGINT) AS content_rows
        FROM nonuni
        ORDER BY doc_id
      """.trim)
      },
      (s, d) => {
        import BmpMedia._
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val w = synthW(id); val h = synthH(id)
            val nTop = (id % 3).toInt; val nBot = (id % 2).toInt
            val rgb = new Array[Byte](w * h * 3)
            var y = 0
            while (y < h) {
              val border = y < nTop || y >= h - nBot
              var x = 0
              while (x < w) {
                val p = (y * w + x) * 3
                if (border) { rgb(p) = 0; rgb(p + 1) = 0; rgb(p + 2) = 0 }
                else {
                  rgb(p) = synthChan(id, x, y, 0)
                  rgb(p + 1) = synthChan(id, x, y, 1)
                  rgb(p + 2) = synthChan(id, x, y, 2)
                }
                x += 1
              }
              y += 1
            }
            val bmp = BmpCodec.decode(
              BmpCodec.encode(w, h, rgb, topDown = id % 2 == 1))
            def rowUniform(yy: Int): Boolean = {
              val base = yy * bmp.width * 3
              var x = 1; var uni = true
              while (x < bmp.width && uni) {
                val p = base + x * 3
                uni = bmp.rgb(p) == bmp.rgb(base) &&
                  bmp.rgb(p + 1) == bmp.rgb(base + 1) &&
                  bmp.rgb(p + 2) == bmp.rgb(base + 2)
                x += 1
              }
              uni
            }
            var firstC = -1; var lastC = -1
            var yy = 0
            while (yy < bmp.height) {
              if (!rowUniform(yy)) { if (firstC < 0) firstC = yy; lastC = yy }
              yy += 1
            }
            val top = if (firstC < 0) bmp.height.toLong else firstC.toLong
            val bot = if (lastC < 0) bmp.height.toLong
              else (bmp.height - 1 - lastC).toLong
            val content = if (firstC < 0) 0L else (lastC - firstC + 1).toLong
            Row(id, bmp.height.toLong, top, bot, content)
          }
        }
        s.createDataFrame(rdd, outSchema).orderBy(col("doc_id"))
      }))
}
