package graft.operators

import graft.{det, QueryDef}
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Poisson bootstrap CI for mean purchase value — THE way to bootstrap
  * at 100 TB: instead of resampling n rows with replacement (which
  * needs global coordination), each row independently draws a
  * Poisson(1) weight per replicate, giving each replicate an
  * approximate multinomial resample in ONE streaming pass. Here the
  * "RNG" is the portable MD5 hash of (event_id, replicate), so every
  * engine, partitioning, and re-run draws identical weights — a
  * reproducible bootstrap (the complement of `ev_bucket_jackknife`,
  * which is the deterministic-buckets alternative).
  *
  * Weights come from the exact Poisson(1) inverse CDF on
  * u = (h32 + 0.5)/2^32, thresholds written as shared double literals
  * (cumulative e^-1 sums, clipped at 5). Per replicate: weighted
  * DECIMAL sums (exact), mean = one double division; the replicate
  * spread is reduced via the snap9 -> DECIMAL route (B-row double sums
  * are order-dependent), and the 10%/90% percentile bounds are picked
  * by a deterministic (mean, replicate) rank over the B = 32 replicate
  * rows. sqrt is the only libm-ish call and is correctly rounded.
  *
  * Scale: one pass over purchases computes all B weighted sums (the
  * explode is over replicates, not data — B rows per purchase feeding
  * one hash aggregate keyed by replicate); everything after is a
  * 32-row frame. Reference scope: extends the experimentation family
  * per SURVEY §2. */
object Bootstrap {

  private val B = 32

  /** Exact Poisson(1) CDF thresholds: P(X <= k) for k = 0..4, values
    * sum_{i<=k} e^-1/i!. Weight 5 beyond (P > 5 is 5.9e-5). */
  private val Cdf: Seq[Double] = {
    val e1 = math.exp(-1.0)
    val probs = Seq(1.0, 1.0, 0.5, 1.0 / 6, 1.0 / 24).map(_ * e1) // e^-1/k!
    probs.scanLeft(0.0)(_ + _).tail
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ev_poisson_bootstrap", {
        val u = s"((${PortableHash.sqlH32("event_id || ':boot:' || b")} + 0.5) / 4294967296.0)"
        val w = s"""(CASE WHEN $u < ${Cdf(0)} THEN 0
                    WHEN $u < ${Cdf(1)} THEN 1
                    WHEN $u < ${Cdf(2)} THEN 2
                    WHEN $u < ${Cdf(3)} THEN 3
                    WHEN $u < ${Cdf(4)} THEN 4 ELSE 5 END)"""
        Some(s"""
        WITH p AS (
          SELECT event_id, value FROM events WHERE event_type = 'purchase'),
        base AS (
          SELECT COUNT(*) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sv
          FROM p),
        reps AS (
          SELECT b,
                 SUM($w) AS wn,
                 CAST(SUM($w * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS wv
          FROM p, range(0, $B) t(b)
          GROUP BY b),
        means AS (
          SELECT b, wv / wn AS m,
                 ROW_NUMBER() OVER (ORDER BY wv / wn, b) AS rk
          FROM reps),
        sd AS (
          SELECT CAST(SUM(CAST(${det.sqlSnap9("m")} AS DECIMAL(28,12))) AS DOUBLE) AS sm,
                 CAST(SUM(CAST(${det.sqlSnap9("m * m")} AS DECIMAL(38,12))) AS DOUBLE) AS smm
          FROM means)
        SELECT CAST(base.n AS BIGINT) AS n_purchases,
               base.sv / base.n AS mean_value,
               CAST($B AS BIGINT) AS n_replicates,
               ${det.sqlSnap9(s"sqrt((sd.smm - sd.sm * sd.sm / $B) / ($B - 1.0))")}
                 AS boot_se,
               (SELECT m FROM means WHERE rk = 4) AS ci_lo_p10,
               (SELECT m FROM means WHERE rk = 29) AS ci_hi_p90
        FROM base CROSS JOIN sd
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val p = events(s, d).filter($"event_type" === "purchase")
          .select($"event_id", $"value")
        val base = p.agg(count(lit(1)).as("n"),
          sum($"value".cast(DecimalType(28, 10))).cast("double").as("sv"))
        val uCol = (PortableHash.h32(concat($"event_id", lit(":boot:"), $"b"))
          + lit(0.5)) / lit(4294967296.0)
        val wCol = when(uCol < Cdf(0), 0L).when(uCol < Cdf(1), 1L)
          .when(uCol < Cdf(2), 2L).when(uCol < Cdf(3), 3L)
          .when(uCol < Cdf(4), 4L).otherwise(5L)
        val reps = p
          .select($"event_id", $"value", explode(array((0 until B).map(lit): _*)).as("b"))
          .select($"b", wCol.as("w"), $"value")
          .groupBy($"b")
          .agg(sum($"w").as("wn"),
            sum($"w" * $"value".cast(DecimalType(28, 10))).cast("double").as("wv"))
        val means = reps.select($"b", ($"wv" / $"wn").as("m"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy($"m", $"b")))
        val sd = means.agg(
          sum(det.snap9($"m").cast(DecimalType(28, 12))).cast("double").as("sm"),
          sum(det.snap9($"m" * $"m").cast(DecimalType(38, 12))).cast("double").as("smm"))
        val lo = means.filter($"rk" === 4).select($"m".as("ci_lo_p10"))
        val hi = means.filter($"rk" === 29).select($"m".as("ci_hi_p90"))
        base.crossJoin(broadcast(sd))
          .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
          .select($"n".cast("long").as("n_purchases"),
            ($"sv" / $"n").as("mean_value"),
            lit(B.toLong).as("n_replicates"),
            det.snap9(sqrt(($"smm" - $"sm" * $"sm" / B) / (B - 1.0))).as("boot_se"),
            $"ci_lo_p10", $"ci_hi_p90")
      }))
}
