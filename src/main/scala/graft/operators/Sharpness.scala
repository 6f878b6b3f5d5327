package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gradient-energy sharpness over REAL decoded BMP pixels — the
  * cheapest blur/flat-fill detector in an image curation gate: mean
  * absolute horizontal luminance gradient, mean |lum(x+1,y) −
  * lum(x,y)|. Blurred or solid images score near zero; textured ones
  * high. Runs on the mm_bmp_decode harness (synth raster → real BMP
  * encode with both row orders and padded strides → features ONLY
  * from the structural parse), so a stride/orientation bug reshuffles
  * neighbor pairs and fails the hash.
  *
  * Determinism: luminance and gradients are exact integers; the only
  * double is the final exact-int mean (bit-identical unsnapped).
  *
  * Scale: pure map stage — decode and the gradient scan are
  * partition-local over payloads that never shuffle.
  */
object Sharpness {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_pairs", LongType),
    StructField("sum_grad", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_sharpness", {
        def h(c: Int) = PortableHash.sqlH32(s"doc_id || ':' || x || ':' || y || ':' || $c")
        Some(s"""
          WITH g AS (
            SELECT doc_id,
                   CAST(8 + doc_id % 9 AS BIGINT) AS w,
                   CAST(4 + doc_id % 5 AS BIGINT) AS h
            FROM documents),
          xs AS (SELECT doc_id, h, w, UNNEST(range(0, w)) AS x FROM g),
          ps AS (SELECT doc_id, w, x, UNNEST(range(0, h)) AS y FROM xs),
          px AS (
            SELECT doc_id, w, x, y,
                   CAST(${h(0)} % 256 + ${h(1)} % 256 + ${h(2)} % 256
                     AS BIGINT) AS lum
            FROM ps),
          gr AS (
            SELECT a.doc_id, ABS(b.lum - a.lum) AS grad
            FROM px a JOIN px b
              ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
            WHERE a.x + 1 < a.w)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(grad) AS BIGINT) AS sum_grad,
                 SUM(grad) * 1.0 / COUNT(*) AS sharpness
          FROM gr GROUP BY doc_id
          ORDER BY doc_id
        """.trim)
      },
      (s, d) => {
        import BmpMedia._
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val payload = {
              val w = synthW(id); val h = synthH(id)
              val rgb = new Array[Byte](w * h * 3)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = (y * w + x) * 3
                  rgb(p) = synthChan(id, x, y, 0)
                  rgb(p + 1) = synthChan(id, x, y, 1)
                  rgb(p + 2) = synthChan(id, x, y, 2)
                  x += 1
                }
                y += 1
              }
              BmpCodec.encode(w, h, rgb, topDown = id % 2 == 1)
            }
            val bmp = BmpCodec.decode(payload)
            def lum(x: Int, y: Int): Long = {
              val p = (y * bmp.width + x) * 3
              (bmp.rgb(p) & 0xff).toLong + (bmp.rgb(p + 1) & 0xff) +
                (bmp.rgb(p + 2) & 0xff)
            }
            var sum = 0L; var pairs = 0L
            var y = 0
            while (y < bmp.height) {
              var x = 0
              while (x + 1 < bmp.width) {
                sum += math.abs(lum(x + 1, y) - lum(x, y)); pairs += 1
                x += 1
              }
              y += 1
            }
            Row(id, pairs, sum)
          }
        }
        s.createDataFrame(rdd, outSchema)
          .select(col("doc_id"), col("n_pairs"), col("sum_grad"),
            (col("sum_grad") * lit(1.0) / col("n_pairs")).as("sharpness"))
          .orderBy(col("doc_id"))
      }))
}
