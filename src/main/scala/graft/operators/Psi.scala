package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Population stability index over the purchase-value distribution —
  * the model-monitoring gate that fires when a score or feature
  * distribution shifts between a reference window and the live window
  * (here: front vs back half of the event range). Convention: PSI
  * < 0.1 stable, > 0.25 action.
  *
  * The ln term is integer-BUCKETED the same way as
  * [[TextAnalysis]]'s surprisal: the share ratio is the exact rational
  * (n_pre·tot_post)/(n_post·tot_pre), whose floor(log2) is
  * deterministic across engines (a count ratio cannot sit within an
  * ulp of an integer unless it IS a power of two, where log2 is
  * exact). The per-bin contribution (share_pre − share_post)·bits is
  * one IEEE multiply; the total is DECIMAL-routed so it is
  * partitioning-independent. Dataflow: one conditional aggregate per
  * bin (a single groupBy over bounded bins), a broadcast of the
  * one-row totals — nothing grows with event count but the first
  * aggregate, which is map-side combined.
  */
object Psi {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_psi",
      Some("""
        WITH p AS (
          SELECT least(floor(value / 75), 3) AS bin,
                 CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS pre
          FROM events WHERE event_type = 'purchase'),
        b AS (
          SELECT bin,
                 SUM(pre) AS n_pre,
                 SUM(1 - pre) AS n_post
          FROM p GROUP BY bin),
        t AS (SELECT SUM(n_pre) AS tp, SUM(n_post) AS tq FROM b),
        c AS (
          SELECT bin, n_pre, n_post,
                 n_pre * 1.0 / tp AS share_pre,
                 n_post * 1.0 / tq AS share_post,
                 CAST(floor(log2((n_pre * tq) * 1.0 / (n_post * tp))) AS BIGINT) AS log2_bits
          FROM b CROSS JOIN t
          WHERE n_pre > 0 AND n_post > 0),
        s AS (
          SELECT CAST(SUM(CAST((share_pre - share_post) * log2_bits AS DECIMAL(38,12))) AS DOUBLE) AS psi_bits
          FROM c)
        SELECT CAST(bin AS BIGINT) AS bin,
               CAST(n_pre AS BIGINT) AS n_pre, CAST(n_post AS BIGINT) AS n_post,
               share_pre, share_post, log2_bits, psi_bits
        FROM c CROSS JOIN s
        ORDER BY bin
      """.trim),
      (s, d) => {
        import s.implicits._
        val p = events(s, d)
          .filter($"event_type" === "purchase")
          .select(least(floor($"value" / 75), lit(3)).as("bin"),
            when($"ts" < lit("2024-01-16").cast("timestamp"), 1).otherwise(0).as("pre"))
        val b = p.groupBy($"bin")
          .agg(sum($"pre").as("n_pre"), sum(lit(1) - $"pre").as("n_post"))
        val t = b.agg(sum($"n_pre").as("tp"), sum($"n_post").as("tq"))
        val c = b.crossJoin(broadcast(t))
          // PSI needs support in BOTH windows: a bin empty on one side
          // has an undefined log-ratio (and infinite contribution under
          // the unbucketed definition) — the standard move is a min-bin
          // or merge rule; here empty-on-either-side bins are excluded
          .filter($"n_pre" > 0 && $"n_post" > 0)
          .select($"bin", $"n_pre", $"n_post",
            ($"n_pre" * lit(1.0) / $"tp").as("share_pre"),
            ($"n_post" * lit(1.0) / $"tq").as("share_post"),
            floor(log2(($"n_pre" * $"tq") * lit(1.0) / ($"n_post" * $"tp")))
              .cast("long").as("log2_bits"))
        val psi = c.agg(
          sum((($"share_pre" - $"share_post") * $"log2_bits")
            .cast(DecimalType(38, 12))).cast("double").as("psi_bits"))
        c.crossJoin(broadcast(psi))
          .select($"bin".cast("long").as("bin"),
            $"n_pre".cast("long").as("n_pre"), $"n_post".cast("long").as("n_post"),
            $"share_pre", $"share_post", $"log2_bits", $"psi_bits")
          .orderBy($"bin")
      }))
}
