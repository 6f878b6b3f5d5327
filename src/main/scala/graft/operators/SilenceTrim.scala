package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Silence-trim plan over REAL decoded WAV PCM — the first audio
  * preprocessing step (VAD-lite): per clip, the first and last sample
  * whose |amplitude| clears the 8192 gate, the leading/trailing
  * silence lengths, and the trimmed length — the byte ranges an
  * ingestion job would actually slice before paying for a model pass.
  * Runs on the mm_wav_decode harness (synth PCM → real RIFF bytes
  * with JUNK chunks on odd ids → features ONLY from the structural
  * parse); the oracle recomputes the same samples formula-side.
  *
  * Determinism: pure integer thresholding on exact PCM values.
  *
  * Scale: pure map stage — the scan is partition-local over payloads
  * that never shuffle.
  */
object SilenceTrim {

  private val gate = 8192

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", LongType),
    StructField("first_loud", LongType),
    StructField("last_loud", LongType),
    StructField("lead_silence", LongType),
    StructField("trail_silence", LongType),
    StructField("trimmed_len", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_silence_trim", {
        val h = PortableHash.sqlH32("doc_id || ':' || k")
        Some(s"""
        WITH g AS (
          SELECT doc_id, CAST(64 + doc_id % 193 AS BIGINT) AS n
          FROM documents),
        ks AS (SELECT doc_id, n, UNNEST(range(1, n + 1)) AS k FROM g),
        samp AS (
          SELECT doc_id, n, k, $h % 65536 - 32768 AS v FROM ks),
        loud AS (
          SELECT doc_id, MAX(n) AS n,
                 MIN(CASE WHEN abs(v) >= $gate THEN k END) AS first_loud,
                 MAX(CASE WHEN abs(v) >= $gate THEN k END) AS last_loud
          FROM samp GROUP BY doc_id)
        SELECT doc_id, n AS n_samples,
               CAST(COALESCE(first_loud, 0) AS BIGINT) AS first_loud,
               CAST(COALESCE(last_loud, 0) AS BIGINT) AS last_loud,
               CAST(COALESCE(first_loud - 1, n) AS BIGINT) AS lead_silence,
               CAST(COALESCE(n - last_loud, n) AS BIGINT) AS trail_silence,
               CAST(COALESCE(last_loud - first_loud + 1, 0) AS BIGINT)
                 AS trimmed_len
        FROM loud
        ORDER BY doc_id
      """.trim)
      },
      (s, d) => {
        import WavMedia._
        val docs = documents(s, d).select(col("doc_id"))
        val rdd = docs.rdd.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            val payload = {
              val n = synthN(id)
              WavCodec.encode(synthRate(id),
                Array.tabulate(n)(i => synthSample(id, i + 1)),
                extraChunk = id % 2 == 1)
            }
            val wav = WavCodec.decode(payload)
            val v = wav.samples
            val n = v.length.toLong
            var first = 0L; var last = 0L
            var i = 0
            while (i < v.length) {
              if (math.abs(v(i).toInt) >= gate) {
                if (first == 0L) first = i + 1L
                last = i + 1L
              }
              i += 1
            }
            val lead = if (first == 0L) n else first - 1
            val trail = if (last == 0L) n else n - last
            val trimmed = if (first == 0L) 0L else last - first + 1
            Row(id, n, first, last, lead, trail, trimmed)
          }
        }
        s.createDataFrame(rdd, outSchema).orderBy(col("doc_id"))
      }))
}
