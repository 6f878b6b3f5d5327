package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio/video sync-offset estimation over REAL decoded bytes — the
  * crossmodal curation step a multimodal training pipeline runs before
  * trusting any A/V pair (mis-muxed files are endemic in web video):
  * per document, a mono PCM16 WAV carries a per-frame amplitude
  * envelope and a BMP raster carries the matching per-row brightness
  * track, shifted by a planted per-doc offset in [-5, 5]; the query
  * decodes BOTH containers with the real codecs ([[WavMedia.WavCodec]],
  * [[BmpMedia.BmpCodec]]), extracts the integer envelopes (frame RMS²
  * proxy = the constant frame amplitude; row brightness = row channel
  * sum), and recovers the offset as the integer cross-correlation
  * argmax over lags [-8, 8] (smallest lag wins ties — total order).
  * `matched` compares against the planted truth; a decoder slip
  * (channel order, row direction, frame boundary) shows up as a wrong
  * offset long before it shows up in channel sums.
  *
  * Determinism: envelopes and correlations are exact integers; the
  * argmax tiebreak is total. Scale: decode and envelope extraction are
  * partition-local over payloads that never shuffle; the lag sweep is
  * a per-doc loop over 17 lags × 32 frames of integer math.
  */
object AvOffset {

  private val T = 32      // frames per doc
  private val MAXLAG = 8  // lag sweep bound

  /** Planted per-doc offset in [-5, 5]. */
  private[graft] def trueOffset(d: Long): Int = ((d % 11) - 5).toInt

  /** Audio envelope: frame t amplitude in [16, 271] — hash-derived,
    * mirrored in the oracle. */
  private[graft] def env(d: Long, t: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:av:$t".getBytes("UTF-8"))
    val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    (16 + (h % 256L)).toInt
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("true_offset", LongType),
    StructField("est_offset", LongType),
    StructField("peak_corr", LongType),
    StructField("matched", BooleanType)))

  val defs: Seq[QueryDef] = Seq(

    // Both payloads are ENCODED (real WAV/BMP bytes) then DECODED with
    // the strict structural parsers; the oracle never sees bytes — it
    // recomputes the envelopes from the synth formulas and runs the
    // same integer argmax (the mm_bmp_decode oracle pattern).
    QueryDef(
      "mm_av_offset", {
        val h = PortableHash.sqlH32("doc_id || ':av:' || t")
        Some(s"""
          WITH ts AS (
            SELECT doc_id, UNNEST(range(0, $T)) AS t FROM documents),
          e AS (
            SELECT doc_id, t, 16 + $h % 256 AS a FROM ts),
          b AS (
            -- video track: audio envelope shifted by the planted
            -- offset, zero outside [0, T)
            SELECT doc_id, t,
                   CASE WHEN t - ((doc_id % 11) - 5) BETWEEN 0 AND ${T - 1}
                        THEN 16 + ${PortableHash.sqlH32(
          s"doc_id || ':av:' || (t - ((doc_id % 11) - 5))")} % 256
                        ELSE 0 END AS v
            FROM ts),
          lags AS (SELECT UNNEST(range(-$MAXLAG, ${MAXLAG + 1})) AS lag),
          corr AS (
            SELECT e.doc_id, l.lag, SUM(e.a * b.v) AS c
            FROM e JOIN lags l ON TRUE
            JOIN b ON b.doc_id = e.doc_id AND b.t = e.t + l.lag
            GROUP BY e.doc_id, l.lag),
          best AS (
            SELECT doc_id, lag, c,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, lag) AS rn
            FROM corr)
          SELECT doc_id,
                 CAST((doc_id % 11) - 5 AS BIGINT) AS true_offset,
                 CAST(lag AS BIGINT) AS est_offset,
                 CAST(c AS BIGINT) AS peak_corr,
                 lag = (doc_id % 11) - 5 AS matched
          FROM best WHERE rn = 1
          ORDER BY doc_id
        """.trim)
      },
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val off = trueOffset(id)
            // --- encode real containers ---
            val framesPerSample = 50
            val samples = new Array[Short](T * framesPerSample)
            var t = 0
            while (t < T) {
              var i = 0
              while (i < framesPerSample) {
                samples(t * framesPerSample + i) = env(id, t).toShort
                i += 1
              }
              t += 1
            }
            val wavBytes = WavMedia.WavCodec.encode(8000, samples,
              extraChunk = id % 3 == 0)
            // video: T rows of width 8; row t brightness = shifted
            // envelope spread over the R channel of 8 pixels (value
            // < 256 stays in one channel; G/B zero)
            val w = 8
            val rgb = new Array[Byte](w * T * 3)
            var y = 0
            while (y < T) {
              val src = y - off
              val v = if (src >= 0 && src < T) env(id, src) else 0
              // encode v as: first pixel R = v - 16 floor half... keep
              // exact: spread v over R channel: pixel0 gets min(v,255),
              // remainder in pixel1 (v <= 271 so 2 pixels suffice)
              val p0 = math.min(v, 255)
              val p1 = v - p0
              rgb(y * w * 3) = p0.toByte
              rgb(y * w * 3 + 3) = p1.toByte
              y += 1
            }
            val bmpBytes = BmpMedia.BmpCodec.encode(w, T, rgb,
              topDown = id % 2 == 1)
            // --- decode with the strict parsers ---
            val wav = WavMedia.WavCodec.decode(wavBytes)
            val bmp = BmpMedia.BmpCodec.decode(bmpBytes)
            // envelopes from DECODED data only
            val a = Array.tabulate(T)(tt => wav.samples(tt * framesPerSample).toInt)
            val v = Array.tabulate(T) { tt =>
              var sumR = 0
              var x = 0
              while (x < bmp.width) {
                sumR += bmp.rgb((tt * bmp.width + x) * 3) & 0xff
                x += 1
              }
              sumR
            }
            // integer cross-correlation argmax, smallest lag on ties
            var bestLag = 0L; var bestC = Long.MinValue
            var lag = -MAXLAG
            while (lag <= MAXLAG) {
              var c = 0L
              var tt = 0
              while (tt < T) {
                val j = tt + lag
                if (j >= 0 && j < T) c += a(tt).toLong * v(j)
                tt += 1
              }
              if (c > bestC || (c == bestC && lag < bestLag)) {
                bestC = c; bestLag = lag
              }
              lag += 1
            }
            Row(id, off.toLong, bestLag, bestC, bestLag == off.toLong)
          }
        }
        s.createDataFrame(rdd, schema).orderBy(col("doc_id"))
      }))
}
