package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** AMS second-frequency-moment sketch (Alon, Matias & Szegedy, STOC
  * '96): F₂ = Σ_v f_v² of the per-user event counts, estimated by k=8
  * independent ±1-hash counters X_i = Σ_events s_i(user); each X_i²
  * is an unbiased F₂ estimator and the sketch is ONE pass of k
  * mergeable integers — the self-join-free way to monitor traffic
  * concentration (F₂ spikes when a few users dominate) at stream
  * scale. Reported next to the exact F₂ with the mean-estimator
  * relative error, so the sketch's accuracy is itself oracle-checked.
  *
  * Determinism: signs derive from the portable MD5-based universal
  * hash family (the MinHash parameters); every counter and both F₂
  * numbers are exact integers; the relative error is one exact-int
  * arithmetic double (bit-identical unsnapped).
  *
  * Scale: the sketch side is k counters per combine — no per-user
  * state; the exact side (one count-per-user aggregate) is the audit
  * baseline, itself a mergeable two-level aggregate.
  */
object AmsSketch {

  private val k = 8

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sk_ams_f2", {
        val h = PortableHash.sqlH32("CAST(user_id AS VARCHAR)")
        val arms = (0 until k).map { i =>
          val sgn = s"(CAST(${PortableHash.sqlUhash(h, i)} % 2 AS BIGINT) * 2 - 1)"
          s"SELECT $i AS est, SUM($sgn) AS x FROM events"
        }.mkString(" UNION ALL ")
        Some(s"""
        WITH sk AS ($arms),
        est AS (
          SELECT CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) / $k AS f2_est
          FROM sk),
        exact AS (
          SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2
          FROM (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id))
        SELECT CAST($k AS BIGINT) AS n_estimators,
               exact.f2 AS f2_exact,
               est.f2_est AS f2_est,
               (est.f2_est - exact.f2) / exact.f2 AS rel_err
        FROM est CROSS JOIN exact
      """.trim)
      },
      (s, d) => {
        import s.implicits._
        val h = PortableHash.h32($"user_id".cast("string"))
        val xs = (0 until k).map { i =>
          sum(PortableHash.uhash(h, i) % 2 * 2 - 1).as(s"x$i")
        }
        val sketch = events(s, d).agg(xs.head, xs.tail: _*)
        val est = sketch.select(
          ((0 until k).map(i =>
            col(s"x$i").cast(DecimalType(38, 0)) * col(s"x$i"))
            .reduce(_ + _).cast("double") / k).as("f2_est"))
        val exact = events(s, d)
          .groupBy($"user_id").agg(count(lit(1)).as("c"))
          .agg(sum($"c".cast(DecimalType(38, 0)) * $"c")
            .cast("long").as("f2"))
        est.crossJoin(exact)
          .select(lit(k.toLong).as("n_estimators"),
            $"f2".as("f2_exact"), $"f2_est",
            (($"f2_est" - $"f2") / $"f2").as("rel_err"))
      }))
}
