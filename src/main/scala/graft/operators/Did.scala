package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Difference-in-differences — the causal-analytics readout for a
  * rollout that switched on mid-window: the treatment arm's pre→post
  * change minus the control arm's, cancelling any shared time trend.
  * Arms are the deterministic `user_id % 2` buckets, the period break
  * is the event-window midpoint (same split as [[Cuped]]). All four
  * cell moments (n, Σv, Σv²) come from ONE conditional aggregate over
  * purchases — DECIMAL sums, one row of state — and the DiD contrast,
  * its Welch-style standard error over the four cells, and the
  * significance flag are fixed-order double expressions afterwards:
  * partitioning-independent and hash-comparable at any scale.
  */
object Did {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_did",
      Some("""
        WITH p AS (
          SELECT user_id % 2 AS variant,
                 CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS pre,
                 CAST(value AS DECIMAL(28,10)) AS dv,
                 CAST(value * value AS DECIMAL(38,10)) AS dv2
          FROM events WHERE event_type = 'purchase'),
        g AS (
          SELECT variant, pre, COUNT(*) AS n,
                 CAST(SUM(dv) AS DOUBLE) AS s,
                 CAST(SUM(dv2) AS DOUBLE) AS q
          FROM p GROUP BY variant, pre),
        m AS (
          SELECT
            SUM(CASE WHEN variant = 0 AND pre = 1 THEN n END) AS n00,
            SUM(CASE WHEN variant = 0 AND pre = 0 THEN n END) AS n01,
            SUM(CASE WHEN variant = 1 AND pre = 1 THEN n END) AS n10,
            SUM(CASE WHEN variant = 1 AND pre = 0 THEN n END) AS n11,
            SUM(CASE WHEN variant = 0 AND pre = 1 THEN s END) AS s00,
            SUM(CASE WHEN variant = 0 AND pre = 0 THEN s END) AS s01,
            SUM(CASE WHEN variant = 1 AND pre = 1 THEN s END) AS s10,
            SUM(CASE WHEN variant = 1 AND pre = 0 THEN s END) AS s11,
            SUM(CASE WHEN variant = 0 AND pre = 1 THEN q END) AS q00,
            SUM(CASE WHEN variant = 0 AND pre = 0 THEN q END) AS q01,
            SUM(CASE WHEN variant = 1 AND pre = 1 THEN q END) AS q10,
            SUM(CASE WHEN variant = 1 AND pre = 0 THEN q END) AS q11
          FROM g)
        SELECT
          s10 / n10 AS treat_pre, s11 / n11 AS treat_post,
          s00 / n00 AS ctrl_pre, s01 / n01 AS ctrl_post,
          (s11 / n11 - s10 / n10) - (s01 / n01 - s00 / n00) AS did,
          sqrt(((q11 - s11 * s11 / n11) / (n11 - 1)) / n11
             + ((q10 - s10 * s10 / n10) / (n10 - 1)) / n10
             + ((q01 - s01 * s01 / n01) / (n01 - 1)) / n01
             + ((q00 - s00 * s00 / n00) / (n00 - 1)) / n00) AS se,
          abs((s11 / n11 - s10 / n10) - (s01 / n01 - s00 / n00))
            > 1.96 * sqrt(((q11 - s11 * s11 / n11) / (n11 - 1)) / n11
                        + ((q10 - s10 * s10 / n10) / (n10 - 1)) / n10
                        + ((q01 - s01 * s01 / n01) / (n01 - 1)) / n01
                        + ((q00 - s00 * s00 / n00) / (n00 - 1)) / n00) AS significant
        FROM m
      """.trim),
      (s, d) => {
        import s.implicits._
        val p = events(s, d)
          .filter($"event_type" === "purchase")
          .select(($"user_id" % 2).as("variant"),
            when($"ts" < lit("2024-01-16").cast("timestamp"), 1).otherwise(0).as("pre"),
            $"value".cast(DecimalType(28, 10)).as("dv"),
            ($"value" * $"value").cast(DecimalType(38, 10)).as("dv2"))
        val g = p.groupBy($"variant", $"pre")
          .agg(count(lit(1)).as("n"),
            sum($"dv").cast("double").as("s"),
            sum($"dv2").cast("double").as("q"))
        def cell(c: String, v: Int, pr: Int) =
          sum(when($"variant" === v && $"pre" === pr, col(c)))
        val m = g.agg(
          cell("n", 0, 1).as("n00"), cell("n", 0, 0).as("n01"),
          cell("n", 1, 1).as("n10"), cell("n", 1, 0).as("n11"),
          cell("s", 0, 1).as("s00"), cell("s", 0, 0).as("s01"),
          cell("s", 1, 1).as("s10"), cell("s", 1, 0).as("s11"),
          cell("q", 0, 1).as("q00"), cell("q", 0, 0).as("q01"),
          cell("q", 1, 1).as("q10"), cell("q", 1, 0).as("q11"))
        def mean(si: String, ni: String) = col(si) / col(ni)
        def varTerm(qi: String, si: String, ni: String) =
          ((col(qi) - col(si) * col(si) / col(ni)) / (col(ni) - 1)) / col(ni)
        val did = (mean("s11", "n11") - mean("s10", "n10")) -
          (mean("s01", "n01") - mean("s00", "n00"))
        val se = sqrt(varTerm("q11", "s11", "n11") + varTerm("q10", "s10", "n10")
          + varTerm("q01", "s01", "n01") + varTerm("q00", "s00", "n00"))
        m.select(
          mean("s10", "n10").as("treat_pre"), mean("s11", "n11").as("treat_post"),
          mean("s00", "n00").as("ctrl_pre"), mean("s01", "n01").as("ctrl_post"),
          did.as("did"), se.as("se"),
          (abs(did) > lit(1.96) * se).as("significant"))
      }))
}
