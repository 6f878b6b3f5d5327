package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-pass mergeable higher-moment sketch: per event type, the raw
  * power sums (n, Σx, Σx², Σx³, Σx⁴) of the cent-scaled value, folded
  * into mean / variance / skewness (g1) / excess kurtosis (g2) by the
  * standard central-moment identities. Power sums are THE mergeable
  * representation of distribution shape — each executor emits five
  * numbers per key and the combine is addition, which is why this is
  * the shape-profiling sketch you run at 100 TB instead of two-pass
  * central moments.
  *
  * Determinism: x = cents(value) is exact BIGINT; all four power sums
  * accumulate in DECIMAL(38,0) (associative, order-free); the moment
  * identities then run in fixed-order double arithmetic from those
  * exact sums, snapped to the 1e-9 grid. The x⁴ sum at 38 digits
  * holds ~1e13 rows of 1e6-cent values — headroom past 100 TB.
  */
object Moments {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sk_moments",
      Some(s"""
        WITH c AS (
          SELECT event_type,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
          FROM events),
        ps AS (
          -- HUGEINT: x^4 ~ 1e19 overflows BIGINT per-row; Spark's side
          -- runs the same exact algebra in DECIMAL(38,0)
          SELECT event_type, COUNT(*) AS n,
                 SUM(CAST(x AS HUGEINT)) AS s1,
                 SUM(CAST(x AS HUGEINT) * x) AS s2,
                 SUM(CAST(x AS HUGEINT) * x * x) AS s3,
                 SUM(CAST(x AS HUGEINT) * x * x * x) AS s4
          FROM c GROUP BY event_type),
        m AS (
          SELECT event_type, n,
                 CAST(s1 AS DOUBLE) / n AS mu,
                 CAST(s2 AS DOUBLE) / n AS r2,
                 CAST(s3 AS DOUBLE) / n AS r3,
                 CAST(s4 AS DOUBLE) / n AS r4
          FROM ps)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               ${det.sqlSnap9("mu / 100.0")} AS mean,
               ${det.sqlSnap9("(r2 - mu * mu) / 10000.0")} AS variance,
               ${det.sqlSnap9(
          "(r3 - 3 * mu * r2 + 2 * mu * mu * mu)" +
            " / pow(r2 - mu * mu, 1.5)")} AS skewness,
               ${det.sqlSnap9(
          "(r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu)" +
            " / pow(r2 - mu * mu, 2.0) - 3.0")} AS kurtosis_excess
        FROM m
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        val c = events(s, d)
          .select($"event_type",
            ($"value".cast(DecimalType(18, 2)) * 100).cast("long").as("x"))
        val dec = $"x".cast(DecimalType(38, 0))
        val ps = c.groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum(dec).as("s1"),
            sum(dec * $"x").as("s2"),
            sum(dec * $"x" * $"x").as("s3"),
            sum(dec * $"x" * $"x" * $"x").as("s4"))
        val m = ps.select($"event_type", $"n",
          ($"s1".cast("double") / $"n").as("mu"),
          ($"s2".cast("double") / $"n").as("r2"),
          ($"s3".cast("double") / $"n").as("r3"),
          ($"s4".cast("double") / $"n").as("r4"))
        m.select($"event_type", $"n".cast("long").as("n"),
            det.snap9($"mu" / 100.0).as("mean"),
            det.snap9(($"r2" - $"mu" * $"mu") / 10000.0).as("variance"),
            det.snap9(($"r3" - lit(3) * $"mu" * $"r2"
              + lit(2) * $"mu" * $"mu" * $"mu")
              / pow($"r2" - $"mu" * $"mu", 1.5)).as("skewness"),
            det.snap9(($"r4" - lit(4) * $"mu" * $"r3"
              + lit(6) * $"mu" * $"mu" * $"r2"
              - lit(3) * $"mu" * $"mu" * $"mu" * $"mu")
              / pow($"r2" - $"mu" * $"mu", 2.0) - lit(3.0)).as("kurtosis_excess"))
          .orderBy($"event_type")
      }))
}
