package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Format sniffing + decoder dispatch over a MIXED binary column —
  * the actual first step of multimodal ingestion, where a payload
  * column holds several container formats and the pipeline must route
  * each blob by its magic bytes, not by a trusted extension: 'BM' →
  * the BMP raster parser, 'RIFF'/'WAVE' → the WAV PCM parser, anything
  * else → quarantine. Emits per blob the sniffed format, byte size,
  * and two decoder-derived fields (pixels/height for rasters,
  * samples/rate for audio) — every number comes from the REAL parse
  * of real container bytes (even docs carry BMP, odd docs WAV with a
  * JUNK chunk), and the oracle recomputes them from the synth
  * formulas, so sniffing the wrong format or mis-walking a chunk
  * fails the hash.
  *
  * Determinism: pure integer metadata.
  *
  * Scale: a pure map stage — sniff + decode are partition-local over
  * payloads that never shuffle.
  */
object FormatDispatch {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("meta1", LongType),
    StructField("meta2", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_format_dispatch",
      Some("""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS format,
               CASE WHEN doc_id % 2 = 0
                    THEN 54 + (((8 + doc_id % 9) * 3 + 3) // 4 * 4)
                           * (4 + doc_id % 5)
                    ELSE 64 + 2 * (64 + doc_id % 193) END AS n_bytes,
               CASE WHEN doc_id % 2 = 0
                    THEN (8 + doc_id % 9) * (4 + doc_id % 5)
                    ELSE 64 + doc_id % 193 END AS meta1,
               CASE WHEN doc_id % 2 = 0
                    THEN 4 + doc_id % 5
                    ELSE 8000 + (doc_id % 3) * 4000 END AS meta2
        FROM documents
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        import BmpMedia._
        import WavMedia._
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            // mixed-container fixture: even ids ship a BMP raster,
            // odd ids a WAV with a JUNK chunk — then the synth inputs
            // are DISCARDED; everything below must come from sniffing
            // and parsing the bytes alone
            val payload: Array[Byte] =
              if (id % 2 == 0) {
                val w = BmpMedia.synthW(id); val h = BmpMedia.synthH(id)
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
                BmpCodec.encode(w, h, rgb, topDown = false)
              } else {
                val n = synthN(id)
                WavCodec.encode(synthRate(id),
                  Array.tabulate(n)(i => synthSample(id, i + 1)),
                  extraChunk = true)
              }
            def tag(off: Int, len: Int) =
              new String(payload, off, len, "US-ASCII")
            val (fmt, m1, m2) =
              if (payload.length >= 2 && tag(0, 2) == "BM") {
                val b = BmpCodec.decode(payload)
                ("bmp", b.width.toLong * b.height, b.height.toLong)
              } else if (payload.length >= 12 && tag(0, 4) == "RIFF"
                && tag(8, 4) == "WAVE") {
                val wv = WavCodec.decode(payload)
                ("wav", wv.samples.length.toLong, wv.sampleRate.toLong)
              } else ("unknown", -1L, -1L)
            Row(id, fmt, payload.length.toLong, m1, m2)
          }
        }
        s.createDataFrame(rdd, outSchema).orderBy(col("doc_id"))
      }))
}
