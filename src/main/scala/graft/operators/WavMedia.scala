package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A REAL media decoder behind the [[Multimodal.MediaDecoder]] seam:
  * RIFF/WAVE PCM16 is fully decodable in pure JVM code (no native
  * codec), so this family's features come from actual byte parsing —
  * the distance between "multimodal columns as plumbing" and "as
  * product" that the other `mm_*` rows stub behind `FakeDecoder`.
  *
  * The pipeline is the production shape end-to-end: binary payloads are
  * built and decoded per partition (payload bytes never shuffle), the
  * decoder is a genuine chunk-walker (validates RIFF/WAVE magic, walks
  * the chunk list honoring word alignment, reads `fmt ` fields, parses
  * little-endian PCM16 from `data`), and every emitted feature is
  * computed ONLY from the parsed result — the generator's sample array
  * is discarded after encoding. Half the payloads carry an extra junk
  * chunk between `fmt ` and `data`, so a fixed-offset-44 pseudo-parser
  * would fail the oracle on half the corpus: hash-equality with the
  * formula-side oracle certifies the structural parse, not just a byte
  * round-trip.
  *
  * Reference anchor: the reference treats attachments as opaque typed
  * blobs at its API boundary (static/app.jsx renders, app.py stores);
  * decoding is out of its engine but squarely in a 100 TB curation
  * pipeline's, per the assignment's multimodal-columns mandate.
  */
object WavMedia {

  /** Parsed WAV: format fields from `fmt `, samples from `data`. */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short])

  /** Pure-JVM RIFF/WAVE PCM16 codec. Encode writes a spec-compliant
    * file (canonical 44-byte header, optional extra chunk); decode is
    * a strict structural parser that fails loudly on malformed input
    * rather than guessing — at ingest scale a silent mis-parse poisons
    * every downstream feature.
    */
  object WavCodec {

    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    /** Mono PCM16 WAV bytes; `extraChunk` optionally inserts a junk
      * chunk between `fmt ` and `data` (spec-legal; real files carry
      * LIST/INFO chunks there) to keep decoders honest. */
    def encode(sampleRate: Int, samples: Array[Short],
        extraChunk: Boolean = false): Array[Byte] = {
      val dataSize = samples.length * 2
      val junk: Array[Byte] =
        if (!extraChunk) Array.emptyByteArray
        else "JUNK".getBytes("US-ASCII") ++ le32(12) ++ Array.fill(12)(0x5a.toByte)
      val riffSize = 4 + (8 + 16) + junk.length + (8 + dataSize)
      val out = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).put(le32(riffSize))
        .put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).put(le32(16))
        .put(le16(1))                        // PCM
        .put(le16(1))                        // mono
        .put(le32(sampleRate))
        .put(le32(sampleRate * 2))           // byte rate
        .put(le16(2))                        // block align
        .put(le16(16))                       // bits per sample
      out.put(junk)
      out.put("data".getBytes("US-ASCII")).put(le32(dataSize))
      samples.foreach(s => out.putShort(s))
      out.array()
    }

    /** Structural parse: magic check, chunk walk (word-aligned), `fmt `
      * validation (PCM, mono, 16-bit), little-endian sample read. */
    def decode(bytes: Array[Byte]): Wav = {
      def fail(msg: String) = throw new IllegalArgumentException(s"WAV parse: $msg")
      if (bytes.length < 12) fail(s"truncated header (${bytes.length} bytes)")
      def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
      def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def u32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      if (tag(0) != "RIFF") fail(s"bad magic '${tag(0)}'")
      if (tag(8) != "WAVE") fail(s"not a WAVE form ('${tag(8)}')")
      val riffEnd = math.min(8L + u32(4), bytes.length.toLong)
      var off = 12L
      var rate = -1; var channels = -1; var bits = -1
      var samples: Array[Short] = null
      while (off + 8 <= riffEnd) {
        val id = tag(off.toInt)
        val sz = u32(off.toInt + 4)
        val body = off + 8
        if (body + sz > riffEnd) fail(s"chunk '$id' overruns RIFF payload")
        id match {
          case "fmt " =>
            if (sz < 16) fail(s"fmt chunk too small ($sz)")
            val fmtCode = u16(body.toInt)
            if (fmtCode != 1) fail(s"not PCM (format $fmtCode)")
            channels = u16(body.toInt + 2)
            rate = u32(body.toInt + 4).toInt
            bits = u16(body.toInt + 14)
          case "data" =>
            if (rate < 0) fail("data chunk before fmt ")
            if (bits != 16) fail(s"expected PCM16, got $bits-bit")
            if (channels != 1) fail(s"expected mono, got $channels channels")
            if (sz % 2 != 0) fail(s"odd data size $sz for 16-bit samples")
            val n = (sz / 2).toInt
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              val b = body.toInt + 2 * i
              out(i) = ((bytes(b) & 0xff) | ((bytes(b + 1) & 0xff) << 8)).toShort
              i += 1
            }
            samples = out
          case _ => () // unknown chunk (JUNK/LIST/cue ...): skip
        }
        off = body + sz + (sz & 1) // chunks are word-aligned
      }
      if (samples == null) fail("no data chunk")
      Wav(rate, channels, bits, samples)
    }
  }

  /** The decoder seam adapter: a [[Multimodal.MediaDecoder]] whose
    * metadata comes from a REAL parse (vs `FakeDecoder`'s md5 stand-in).
    * Frame count = sample count; "width" carries the sample rate. */
  object WavDecoder extends Multimodal.MediaDecoder {
    def decode(payload: Array[Byte]): Multimodal.MediaMeta = {
      val w = WavCodec.decode(payload)
      Multimodal.MediaMeta(width = w.sampleRate, height = w.channels,
        nFrames = w.samples.length, format = s"pcm${w.bitsPerSample}")
    }
  }

  /** Deterministic per-doc synth params — mirrored literally in the
    * oracle SQL so DuckDB can score the decode without parsing bytes. */
  private[graft] def synthRate(d: Long): Int = (8000 + (d % 3) * 4000).toInt
  private[graft] def synthN(d: Long): Int = (64 + d % 193).toInt

  /** Sample k (1-based) of doc d: first 32 md5 bits of "d:k" folded to
    * int16 — the JVM twin of `PortableHash.sqlH32` so both engines
    * derive identical PCM. */
  private[graft] def synthSample(d: Long, k: Int): Short = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$k".getBytes("UTF-8"))
    val h = ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
    ((h % 65536L).toInt - 32768).toShort
  }

  private val wavSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", LongType),
    StructField("n_samples", LongType),
    StructField("peak_abs", LongType),
    StructField("sum_abs", LongType),
    StructField("n_zero_cross", LongType)))

  val defs: Seq[QueryDef] = Seq(

    // WAV synth → encode → REAL decode → signal features, scored by a
    // formula-side oracle. Features (peak, L1 energy, zero crossings)
    // are integer-exact, computed ONLY from parsed bytes; odd doc_ids
    // carry a junk chunk so the parse must be structural. Everything is
    // partition-local until the final orderBy — at 100 TB this is a
    // pure map stage sized by input splits.
    QueryDef(
      "mm_wav_decode", {
        val h = PortableHash.sqlH32("doc_id || ':' || k")
        Some(s"""
          WITH g AS (
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
                   CAST(64 + doc_id % 193 AS BIGINT) AS n_samples
            FROM documents),
          ks AS (
            SELECT doc_id, UNNEST(range(1, n_samples + 1)) AS k FROM g),
          samp AS (
            SELECT doc_id, k, $h % 65536 - 32768 AS v FROM ks),
          lagged AS (
            SELECT doc_id, v,
                   LAG(v) OVER (PARTITION BY doc_id ORDER BY k) AS prev
            FROM samp),
          feat AS (
            SELECT doc_id,
                   CAST(MAX(ABS(v)) AS BIGINT) AS peak_abs,
                   CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
                   CAST(SUM(CASE WHEN prev IS NOT NULL
                                  AND (prev < 0) != (v < 0)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
            FROM lagged GROUP BY doc_id)
          SELECT g.doc_id, g.sample_rate, g.n_samples,
                 f.peak_abs, f.sum_abs, f.n_zero_cross
          FROM g JOIN feat f USING (doc_id)
          ORDER BY g.doc_id
        """.trim)
      },
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            // encode: synth samples → real WAV bytes, then DROP the
            // synth array — features must come from the parse alone.
            val payload = {
              val n = synthN(id)
              val pcm = Array.tabulate(n)(i => synthSample(id, i + 1))
              WavCodec.encode(synthRate(id), pcm, extraChunk = id % 2 == 1)
            }
            val wav = WavCodec.decode(payload)
            var peak = 0L; var sumAbs = 0L; var zc = 0L
            var i = 0
            while (i < wav.samples.length) {
              val v = wav.samples(i).toLong
              val a = math.abs(v)
              if (a > peak) peak = a
              sumAbs += a
              if (i > 0 && (wav.samples(i - 1) < 0) != (v < 0)) zc += 1
              i += 1
            }
            Row(id, wav.sampleRate.toLong, wav.samples.length.toLong,
              peak, sumAbs, zc)
          }
        }
        s.createDataFrame(rdd, wavSchema).orderBy(col("doc_id"))
      }))
}
