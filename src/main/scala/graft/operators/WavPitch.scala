package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Autocorrelation pitch detection over REAL decoded WAV PCM — the
  * textbook time-domain fundamental-frequency estimator (Rabiner,
  * IEEE TASSP 1977): the lag ℓ ∈ [20, 60] maximizing
  * r(ℓ) = Σ v_k·v_{k+ℓ}, reported with its normalized strength
  * r(ℓ)/r(0) (≈1 → strongly periodic, ≈0 → noise). The feature an
  * audio curation pipeline uses to split voiced/tonal clips from
  * noise before expensive model passes.
  *
  * The payload path is the mm_wav_decode harness: deterministic synth
  * PCM → real RIFF encode (odd docs carry an extra chunk) → features
  * ONLY from [[WavMedia.WavCodec]]'s structural parse; the oracle
  * recomputes the same samples formula-side, so a parse bug (chunk
  * walk, sample width) shifts every correlation and fails the hash.
  *
  * Determinism: all correlations are exact 64-bit integer sums
  * (|v|≤2¹⁵, n≤256 ⇒ |r|≤2³⁸); the argmax tiebreak is smallest lag;
  * the only double is the final exact-int ratio — bit-identical
  * unsnapped.
  *
  * Scale: the entire lag scan is partition-local arithmetic over each
  * payload's samples (payloads never shuffle); output is one row per
  * doc into a sort — a pure map stage.
  */
object WavPitch {

  private val minLag = 20
  private val maxLag = 60

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_samples", LongType),
    StructField("best_lag", LongType),
    StructField("r0", LongType),
    StructField("r_best", LongType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm_wav_pitch", {
        val h = PortableHash.sqlH32("doc_id || ':' || k")
        Some(s"""
          WITH g AS (
            SELECT doc_id, CAST(64 + doc_id % 193 AS BIGINT) AS n
            FROM documents),
          ks AS (SELECT doc_id, n, UNNEST(range(1, n + 1)) AS k FROM g),
          samp AS (
            SELECT doc_id, n, k, $h % 65536 - 32768 AS v FROM ks),
          r0 AS (
            SELECT doc_id, CAST(SUM(v * v) AS BIGINT) AS r0 FROM samp
            GROUP BY doc_id),
          lags AS (SELECT UNNEST(range($minLag, ${maxLag + 1})) AS lag),
          rl AS (
            SELECT a.doc_id, l.lag, CAST(SUM(a.v * b.v) AS BIGINT) AS r
            FROM samp a
            CROSS JOIN lags l
            JOIN samp b ON b.doc_id = a.doc_id AND b.k = a.k + l.lag
            GROUP BY a.doc_id, l.lag),
          best AS (
            SELECT doc_id, lag, r FROM (
              SELECT doc_id, lag, r,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY r DESC, lag) AS rn
              FROM rl)
            WHERE rn = 1)
          SELECT g.doc_id, g.n AS n_samples,
                 CAST(b.lag AS BIGINT) AS best_lag,
                 r0.r0 AS r0, b.r AS r_best,
                 b.r * 1.0 / r0.r0 AS strength
          FROM g JOIN best b USING (doc_id) JOIN r0 USING (doc_id)
          ORDER BY g.doc_id
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
              val pcm = Array.tabulate(n)(i => synthSample(id, i + 1))
              WavCodec.encode(synthRate(id), pcm, extraChunk = id % 2 == 1)
            }
            val wav = WavCodec.decode(payload)
            val v = wav.samples
            val n = v.length
            var r0 = 0L
            var i = 0
            while (i < n) { r0 += v(i).toLong * v(i); i += 1 }
            var bestLag = -1L; var bestR = Long.MinValue
            var lag = minLag
            while (lag <= maxLag) {
              var r = 0L; var k = 0
              while (k + lag < n) { r += v(k).toLong * v(k + lag); k += 1 }
              if (r > bestR) { bestR = r; bestLag = lag }
              lag += 1
            }
            Row(id, n.toLong, bestLag, r0, bestR)
          }
        }
        s.createDataFrame(rdd, outSchema)
          .select(col("doc_id"), col("n_samples"), col("best_lag"),
            col("r0"), col("r_best"),
            (col("r_best") * lit(1.0) / col("r0")).as("strength"))
          .orderBy(col("doc_id"))
      }))
}
