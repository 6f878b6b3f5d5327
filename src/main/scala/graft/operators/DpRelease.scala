package graft.operators

import graft.{det, QueryDef}
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Differentially-private histogram release — the privacy mechanism a
  * training-data pipeline applies before publishing corpus statistics
  * (dataset cards, per-source counts) about sensitive sources. The
  * complement to `dq_k_anonymity`: k-anonymity audits the raw table,
  * DP perturbs the RELEASE.
  *
  * Mechanism: per-cell Laplace(sensitivity/epsilon) noise via inverse
  * CDF, with the uniform drawn from the portable MD5 hash of the cell
  * key — a SEEDED, reproducible release (the standard trick for
  * auditable DP publishing: the noise is cryptographically derived
  * from a release nonce + cell id, so re-runs publish identical
  * numbers and the noise is still Laplace-distributed across cells).
  * Counts have L1 sensitivity 1 per (histogram, neighbor-row) pair;
  * the epsilon ledger row carries the composed budget over the two
  * released histograms (basic composition: eps_total = eps1 + eps2).
  *
  *   u in (0,1) from h32(cell)/2^32;  noise = -b * sgn(u-0.5) * ln(1-2|u-0.5|)
  *
  * Everything before the ln is exact integer/rational; ln/exp are the
  * only libm calls, so the noisy values are snapped to the 1e-9 grid
  * (both engines add identical snapped noise to identical exact
  * counts). Released counts clamp at 0 and round to integers — the
  * post-processing DP allows for free.
  *
  * The emitted row is the AUDIT view (true count, noise, and released
  * count side by side — what a privacy review inspects); a production
  * release publishes `released_n` and `eps_total` only.
  *
  * Scale: one groupBy per histogram; noise is a per-cell scalar
  * expression — no extra exchange, no driver randomness, no RNG state
  * to coordinate across executors (the hash IS the RNG). */
object DpRelease {

  private val eps1 = 0.5 // per-source histogram budget
  private val eps2 = 0.5 // per-language histogram budget

  /** Seeded Laplace noise for a cell key expression, scale b = 1/eps. */
  private def lapNoise(key: org.apache.spark.sql.Column, eps: Double) = {
    val u = (PortableHash.h32(key) + lit(0.5)) / lit(4294967296.0) // (0,1)
    val c = u - lit(0.5)
    val mag = -(lit(1.0) / eps) * log(lit(1.0) - lit(2.0) * abs(c))
    det.snap9(when(c >= 0, mag).otherwise(-mag))
  }

  private def sqlLap(key: String, eps: Double): String = {
    val u = s"((${PortableHash.sqlH32(key)} + 0.5) / 4294967296.0)"
    val mag = s"(-(1.0 / $eps) * ln(1.0 - 2.0 * abs($u - 0.5)))"
    det.sqlSnap9(s"(CASE WHEN $u - 0.5 >= 0 THEN $mag ELSE -$mag END)")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_dp_release",
      Some(s"""
        WITH src AS (
          SELECT 'by_source' AS histogram, source AS cell, COUNT(*) AS n
          FROM documents GROUP BY source),
        lng AS (
          SELECT 'by_lang' AS histogram, lang AS cell, COUNT(*) AS n
          FROM documents GROUP BY lang),
        rel AS (
          SELECT histogram, cell, n,
                 ${sqlLap("'dp-r9:' || histogram || ':' || cell", eps1)} AS noise
          FROM src
          UNION ALL
          SELECT histogram, cell, n,
                 ${sqlLap("'dp-r9:' || histogram || ':' || cell", eps2)} AS noise
          FROM lng)
        SELECT histogram, cell,
               CAST(n AS BIGINT) AS true_n,
               CAST(GREATEST(0, CAST(round(n + noise) AS BIGINT)) AS BIGINT)
                 AS released_n,
               noise AS laplace_noise,
               CAST(${eps1 + eps2} AS DOUBLE) AS eps_total
        FROM rel
        ORDER BY histogram, cell
      """.trim),
      (s, d) => {
        val docs = documents(s, d)
        def hist(name: String, c: String, eps: Double) = docs
          .groupBy(col(c).as("cell"))
          .agg(count(lit(1)).as("n"))
          .select(lit(name).as("histogram"), col("cell"), col("n"),
            lapNoise(concat(lit("dp-r9:"), lit(name), lit(":"), col("cell")), eps)
              .as("noise"))
        hist("by_source", "source", eps1)
          .unionAll(hist("by_lang", "lang", eps2))
          .select(col("histogram"), col("cell"),
            col("n").cast("long").as("true_n"),
            greatest(lit(0L), round(col("n") + col("noise")).cast("long"))
              .as("released_n"),
            col("noise").as("laplace_noise"),
            lit(eps1 + eps2).as("eps_total"))
          .orderBy(col("histogram"), col("cell"))
      }))
}
