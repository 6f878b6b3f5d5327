package graft.operators

import graft.QueryDef
import graft.det
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Benford's-law conformance audit (Newcomb 1881; Benford 1938; Nigrini
  * 2012 for the fraud-audit practice): the leading-digit distribution
  * of naturally-occurring multi-scale amounts follows
  * P(d) = log10(1 + 1/d); synthetic, capped, or fabricated columns
  * deviate hard. The classic data-quality tripwire for "is this amount
  * column organic or generated" — run per metric over order totals and
  * lineitem extended prices.
  *
  * Determinism discipline:
  *   - the leading digit comes from the STRING of the integer cents
  *     value (`floor(x * 100 + 0.5)` — explicit half-up rounding,
  *     because Spark's double→long cast truncates while DuckDB's
  *     rounds; positive-integer rendering is identical in both
  *     engines) — never from
  *     `floor(x/10^floor(log10 x))`, whose transcendental can land on
  *     either side of a power of ten;
  *   - the nine expected Benford shares are shared 12-digit literals
  *     (interpolated from ONE Scala constant into both the DataFrame
  *     code and the oracle SQL), so no engine evaluates a log;
  *   - observed shares and the MAD / chi-square statistics are single
  *     divisions and snap9-rounded sums of exactly-representable
  *     counts.
  *
  * Scale: one scan per metric → 9-row digit histogram each (map-side
  * combined hash aggregate); the conformance stats are windows over
  * the 18-row union. Nothing superlinear, nothing driver-side.
  */
object DataLaws {

  /** P(d) = log10(1+1/d), d = 1..9, fixed to 12 decimal places — the
    * single source both engines quote as literals. */
  private val benford: Seq[(Int, String)] = Seq(
    1 -> "0.301029995664", 2 -> "0.176091259056", 3 -> "0.124938736608",
    4 -> "0.096910013008", 5 -> "0.079181246048", 6 -> "0.066946789631",
    7 -> "0.057991946978", 8 -> "0.051152522447", 9 -> "0.045757490561")

  private val sqlExpected =
    benford.map { case (d, p) => s"($d, $p)" }.mkString(", ")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_benford",
      Some(s"""
        WITH amounts AS (
          SELECT 'o_totalprice' AS metric,
                 CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM orders WHERE o_totalprice > 0
          UNION ALL
          SELECT 'l_extendedprice' AS metric,
                 CAST(substr(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM lineitem WHERE l_extendedprice > 0),
        hist AS (
          SELECT metric, digit, COUNT(*) AS n
          FROM amounts GROUP BY 1, 2),
        expected(digit, p) AS (VALUES $sqlExpected),
        joined AS (
          SELECT h.metric, CAST(h.digit AS BIGINT) AS digit,
                 CAST(h.n AS BIGINT) AS n,
                 SUM(h.n) OVER (PARTITION BY h.metric) AS total,
                 CAST(e.p AS DOUBLE) AS expected_share
          FROM hist h JOIN expected e ON e.digit = h.digit),
        terms AS (
          -- each term is one deterministic IEEE expression per row;
          -- snap to the 1e-9 grid and sum as DECIMAL so the 9-term
          -- fold is order-independent in both engines
          SELECT metric, digit, n, total, expected_share,
                 CAST(${det.sqlSnap9("abs(n * 1.0 / total - expected_share)")} AS DECIMAL(28,12)) AS adev,
                 CAST(${det.sqlSnap9("(n * 1.0 / total - expected_share) * (n * 1.0 / total - expected_share) / expected_share")} AS DECIMAL(28,12)) AS c2
          FROM joined)
        SELECT metric, digit, n,
               ${det.sqlSnap9("n * 1.0 / total")} AS share,
               expected_share,
               CAST(adev AS DOUBLE) AS abs_dev,
               ${det.sqlSnap9("CAST(SUM(adev) OVER (PARTITION BY metric) AS DOUBLE) / 9")} AS mad,
               ${det.sqlSnap9("CAST(SUM(c2) OVER (PARTITION BY metric) AS DOUBLE)")} AS chi2_over_n
        FROM terms
        ORDER BY metric, digit
      """.trim),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val amounts = orders(s, d)
          .filter(col("o_totalprice") > 0)
          .select(lit("o_totalprice").as("metric"),
            substring(floor(col("o_totalprice") * 100 + 0.5).cast("long").cast("string"),
              1, 1).cast("long").as("digit"))
          .unionByName(lineitem(s, d)
            .filter(col("l_extendedprice") > 0)
            .select(lit("l_extendedprice").as("metric"),
              substring(floor(col("l_extendedprice") * 100 + 0.5).cast("long").cast("string"),
                1, 1).cast("long").as("digit")))
        val hist = amounts.groupBy(col("metric"), col("digit"))
          .agg(count(lit(1)).as("n"))
        val expected = benford
          .map { case (dg, p) => (dg.toLong, p.toDouble) }
          .toDF("e_digit", "expected_share")
        import org.apache.spark.sql.types.DecimalType
        val wm = Window.partitionBy(col("metric"))
        val dev = col("n") * lit(1.0) / col("total") - col("expected_share")
        val terms = hist
          .join(broadcast(expected), col("digit") === col("e_digit"))
          .withColumn("total", sum(col("n")).over(wm))
          .withColumn("adev", det.snap9(abs(dev)).cast(DecimalType(28, 12)))
          .withColumn("c2",
            det.snap9(dev * dev / col("expected_share")).cast(DecimalType(28, 12)))
        terms.select(col("metric"), col("digit"), col("n"),
            det.snap9(col("n") * lit(1.0) / col("total")).as("share"),
            col("expected_share"),
            col("adev").cast("double").as("abs_dev"),
            det.snap9(sum(col("adev")).over(wm).cast("double") / lit(9)).as("mad"),
            det.snap9(sum(col("c2")).over(wm).cast("double")).as("chi2_over_n"))
          .orderBy(col("metric"), col("digit"))
      }))
}
