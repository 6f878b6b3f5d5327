package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-image luminance-histogram entropy over REAL decoded BMP pixels
  * — the classic cheap "is this image informative or a flat fill"
  * gate a multimodal curation pipeline runs before paying for model
  * inference (near-zero-entropy rasters are solid colors, banners,
  * alpha mattes). Luminance is the channel sum r+g+b binned into 16
  * levels; entropy is Shannon −Σ p ln p over occupied bins.
  *
  * The payload path is the mm_bmp_decode harness: the deterministic
  * synth raster is encoded to actual BMP bytes (both row orders,
  * padded strides) and features come ONLY from [[BmpMedia.BmpCodec]]'s
  * structural parse — the oracle recomputes the same pixels
  * formula-side, so a decode bug (channel order, stride, orientation)
  * shifts luminance bins and fails the hash.
  *
  * Determinism: bins and counts are exact integers; each −p·ln p term
  * is snapped and the per-image fold runs in DECIMAL(28,12).
  *
  * Scale: decode is partition-local over payloads that never shuffle;
  * the pixel stream (w·h rows/doc) feeds one hash aggregate to
  * (doc, bin) and one to doc — both mergeable, no driver state.
  */
object PixelEntropy {

  private val pxSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lum", IntegerType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_pixel_entropy", {
        def h(c: Int) = PortableHash.sqlH32(s"doc_id || ':' || x || ':' || y || ':' || $c")
        Some(s"""
          WITH g AS (
            SELECT doc_id,
                   CAST(8 + doc_id % 9 AS BIGINT) AS w,
                   CAST(4 + doc_id % 5 AS BIGINT) AS h
            FROM documents),
          xs AS (SELECT doc_id, h, UNNEST(range(0, w)) AS x FROM g),
          ps AS (SELECT doc_id, x, UNNEST(range(0, h)) AS y FROM xs),
          px AS (
            SELECT doc_id,
                   CAST(${h(0)} % 256 + ${h(1)} % 256 + ${h(2)} % 256
                     AS BIGINT) // 48 AS bin
            FROM ps),
          hist AS (
            SELECT doc_id, bin, COUNT(*) AS c
            FROM px GROUP BY doc_id, bin),
          n AS (SELECT doc_id, SUM(c) AS n FROM hist GROUP BY doc_id),
          t AS (
            SELECT h.doc_id, n.n,
                   CAST(${det.sqlSnap9(
          "-(h.c * 1.0 / n.n) * ln(h.c * 1.0 / n.n)")} AS DECIMAL(28,12)) AS term
            FROM hist h JOIN n ON n.doc_id = h.doc_id)
          SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_px,
                 CAST(COUNT(*) AS BIGINT) AS n_bins,
                 CAST(SUM(term) AS DOUBLE) AS entropy
          FROM t GROUP BY doc_id
          ORDER BY doc_id
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        import BmpMedia._
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.flatMap { r =>
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
            (0 until bmp.width * bmp.height).iterator.map { i =>
              val lum = (bmp.rgb(3 * i) & 0xff) + (bmp.rgb(3 * i + 1) & 0xff) +
                (bmp.rgb(3 * i + 2) & 0xff)
              Row(id, lum)
            }
          }
        }
        val px = s.createDataFrame(rdd, pxSchema)
          .select($"doc_id", expr("lum div 48").as("bin"))
        val hist = px.groupBy($"doc_id", $"bin").agg(count(lit(1)).as("c"))
        val n = hist.groupBy($"doc_id".as("n_id")).agg(sum($"c").as("n"))
        val t = hist.join(n, $"doc_id" === $"n_id")
          .select($"doc_id", $"n",
            det.snap9(-($"c" * lit(1.0) / $"n") * log($"c" * lit(1.0) / $"n"))
              .cast(DecimalType(28, 12)).as("term"))
        t.groupBy($"doc_id")
          .agg(max($"n").cast("long").as("n_px"),
            count(lit(1)).cast("long").as("n_bins"),
            sum($"term").cast("double").as("entropy"))
          .orderBy($"doc_id")
      }))
}
