package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corrupted-payload triage — the quarantine report a 100 TB
  * multimodal ingest produces BEFORE any feature extraction: real
  * encoded containers (BMP/WAV/PNG), a deterministic seventh of them
  * corrupted in four spec-distinct ways, pushed through the strict
  * structural decoders; each payload is classified ok / bad_magic /
  * crc_mismatch / truncated / parse_error from the decoder's actual
  * failure, and the report is the (container, status) census. This is
  * the error-path exercise of the codec family: a decoder that guesses
  * instead of failing loudly (or fails with the WRONG class) breaks
  * the census, and the oracle knows the planted truth in closed form.
  *
  * Corruption classes by doc_id % 9: 0 ok BMP, 1 ok WAV, 2 ok PNG,
  * 3 PNG with a flipped byte inside the CRC-protected tEXt chunk,
  * 4 WAV truncated mid-data, 5 BMP with a bad magic, 6 PNG truncated
  * mid-IDAT, 7 ok JPEG, 8 JPEG truncated inside the entropy-coded
  * scan (the fourth codec joins the quarantine census).
  *
  * Scale: encode → corrupt → decode → classify is partition-local over
  * payloads that never shuffle; the census is one tiny groupBy.
  */
object DecodeTriage {

  /** Exception-message → quarantine class. Keyword-matched on the
    * decoders' documented failure texts; anything unrecognized lands
    * in parse_error rather than being silently dropped. */
  private[graft] def classify(msg: String): String =
    if (msg == null) "parse_error"
    else if (msg.contains("CRC")) "crc_mismatch"
    else if (msg.contains("magic") || msg.contains("signature")) "bad_magic"
    else if (msg.contains("truncat") || msg.contains("overrun")) "truncated"
    else "parse_error"

  private val schema = StructType(Seq(
    StructField("container", StringType),
    StructField("status", StringType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_decode_triage",
      // The oracle knows the planted truth in closed form — the Spark
      // side must REDISCOVER it through real decode failures.
      Some("""
        WITH plan AS (
          SELECT doc_id,
                 CASE doc_id % 9
                   WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' WHEN 2 THEN 'png'
                   WHEN 3 THEN 'png' WHEN 4 THEN 'wav' WHEN 5 THEN 'bmp'
                   WHEN 6 THEN 'png' ELSE 'jpeg' END AS container,
                 CASE doc_id % 9
                   WHEN 3 THEN 'crc_mismatch'
                   WHEN 4 THEN 'truncated'
                   WHEN 5 THEN 'bad_magic'
                   WHEN 6 THEN 'truncated'
                   WHEN 8 THEN 'truncated'
                   ELSE 'ok' END AS status
          FROM documents)
        SELECT container, status, CAST(COUNT(*) AS BIGINT) AS n
        FROM plan GROUP BY container, status
        ORDER BY container, status
      """.trim),
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val cls = (id % 9).toInt
            def bmpBytes: Array[Byte] = {
              val w = 5; val h = 4
              val rgb = Array.tabulate(w * h * 3)(i =>
                BmpMedia.synthChan(id, i % w, (i / 3) % h, i % 3))
              BmpMedia.BmpCodec.encode(w, h, rgb)
            }
            def wavBytes: Array[Byte] = {
              val samples = Array.tabulate(64)(t =>
                AvOffset.env(id, t % 32).toShort)
              WavMedia.WavCodec.encode(8000, samples, extraChunk = true)
            }
            def pngBytes: Array[Byte] = {
              val w = 6; val h = 6
              val rgb = Array.tabulate(w * h * 3)(i =>
                BmpMedia.synthChan(id, i % w, (i / 3) % h, i % 3))
              PngMedia.PngCodec.encode(w, h, rgb)
            }
            val (container, payload) = cls match {
              case 0 => ("bmp", bmpBytes)
              case 1 => ("wav", wavBytes)
              case 2 => ("png", pngBytes)
              case 3 => // flip a byte inside the tEXt payload (chunk 2,
                // data starts at 8 + 25 + 8 = 41) — CRC must catch it
                val b = pngBytes; b(42) = (b(42) ^ 0x40).toByte; ("png", b)
              case 4 => ("wav", wavBytes.dropRight(10))
              case 5 => val b = bmpBytes; b(0) = 'X'.toByte; ("bmp", b)
              case 6 => ("png", pngBytes.dropRight(30))
              case 7 => ("jpeg", JpegMedia.synthJpeg(id))
              case _ => // cut inside the entropy-coded scan: the bit
                // reader must run out of stuffed bytes, not crash
                ("jpeg", JpegMedia.synthJpeg(id).dropRight(12))
            }
            val status =
              try {
                container match {
                  case "bmp"  => BmpMedia.BmpCodec.decode(payload)
                  case "wav"  => WavMedia.WavCodec.decode(payload)
                  case "jpeg" => JpegMedia.JpegCodec.decode(payload)
                  case _      => PngMedia.PngCodec.decode(payload)
                }
                "ok"
              } catch {
                case e: IllegalArgumentException => classify(e.getMessage)
              }
            Row(container, status)
          }
        }
        s.createDataFrame(rdd, schema)
          .groupBy(col("container"), col("status"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("container"), col("status"))
      }))
}
