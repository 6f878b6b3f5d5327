package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation-pipeline accounting and scheduling: the per-stage filter
  * funnel (the datasheet table every corpus release publishes) and a
  * length-ordered curriculum schedule (easy→hard phase assignment for
  * staged pretraining).
  */
object Curriculum {

  val defs: Seq[QueryDef] = Seq(

    // Filter funnel: cumulative survivor counts through the standard
    // curation stages — language gate, minimum length, token-shape
    // gate, exact dedup — with per-stage drop counts and retention.
    // ONE scan computes all stage flags plus the dedup window (the
    // canonical doc among stage-3 survivors per content hash); the
    // five stage rows then unpack from a single aggregated row, so
    // the funnel costs one shuffle regardless of stage count. All
    // counts are exact integers; retention is one double division.
    QueryDef(
      "pl_filter_funnel",
      Some("""
        WITH f AS (
          SELECT doc_id,
                 lang = 'en' AS f1,
                 len(string_split(text, ' ')) >= 20 AS f2,
                 ((length(text) - len(string_split(text, ' ')) + 1) * 1.0
                    / len(string_split(text, ' '))) BETWEEN 3.0 AND 10.0 AS f3,
                 MIN(CASE WHEN lang = 'en'
                            AND len(string_split(text, ' ')) >= 20
                            AND ((length(text) - len(string_split(text, ' ')) + 1) * 1.0
                                   / len(string_split(text, ' '))) BETWEEN 3.0 AND 10.0
                          THEN doc_id END)
                   OVER (PARTITION BY md5(text)) AS canon
          FROM documents),
        agg AS (
          SELECT COUNT(*) AS c0,
                 COUNT(*) FILTER (WHERE f1) AS c1,
                 COUNT(*) FILTER (WHERE f1 AND f2) AS c2,
                 COUNT(*) FILTER (WHERE f1 AND f2 AND f3) AS c3,
                 COUNT(*) FILTER (WHERE f1 AND f2 AND f3 AND doc_id = canon) AS c4
          FROM f)
        SELECT stage_no, stage, rows_out, dropped,
               CASE WHEN rows_in > 0 THEN rows_out * 1.0 / rows_in END AS retention
        FROM (
          SELECT 0 AS stage_no, 'input' AS stage,
                 CAST(c0 AS BIGINT) AS rows_out, CAST(0 AS BIGINT) AS dropped,
                 CAST(c0 AS BIGINT) AS rows_in FROM agg
          UNION ALL
          SELECT 1, 'lang_en', CAST(c1 AS BIGINT), CAST(c0 - c1 AS BIGINT),
                 CAST(c0 AS BIGINT) FROM agg
          UNION ALL
          SELECT 2, 'min_tokens', CAST(c2 AS BIGINT), CAST(c1 - c2 AS BIGINT),
                 CAST(c1 AS BIGINT) FROM agg
          UNION ALL
          SELECT 3, 'token_shape', CAST(c3 AS BIGINT), CAST(c2 - c3 AS BIGINT),
                 CAST(c2 AS BIGINT) FROM agg
          UNION ALL
          SELECT 4, 'exact_dedup', CAST(c4 AS BIGINT), CAST(c3 - c4 AS BIGINT),
                 CAST(c3 AS BIGINT) FROM agg) t
        ORDER BY stage_no
      """.trim),
      (s, d) => {
        import s.implicits._
        val tk = split($"text", " ")
        val f1 = $"lang" === "en"
        val f2 = size(tk) >= 20
        val f3 = ((length($"text") - size(tk) + 1) * lit(1.0) / size(tk))
          .between(3.0, 10.0)
        val flagged = documents(s, d)
          .select($"doc_id", f1.as("f1"), f2.as("f2"), f3.as("f3"),
            min(when(f1 && f2 && f3, $"doc_id"))
              .over(Window.partitionBy(md5($"text"))).as("canon"))
        val agg = flagged.agg(
          count(lit(1)).as("c0"),
          count(when($"f1", 1)).as("c1"),
          count(when($"f1" && $"f2", 1)).as("c2"),
          count(when($"f1" && $"f2" && $"f3", 1)).as("c3"),
          count(when($"f1" && $"f2" && $"f3" && $"doc_id" === $"canon", 1)).as("c4"))
        val stages = agg.select(explode(array(
          struct(lit(0).as("stage_no"), lit("input").as("stage"),
            $"c0".as("rows_out"), lit(0L).as("dropped"), $"c0".as("rows_in")),
          struct(lit(1).as("stage_no"), lit("lang_en").as("stage"),
            $"c1".as("rows_out"), ($"c0" - $"c1").as("dropped"), $"c0".as("rows_in")),
          struct(lit(2).as("stage_no"), lit("min_tokens").as("stage"),
            $"c2".as("rows_out"), ($"c1" - $"c2").as("dropped"), $"c1".as("rows_in")),
          struct(lit(3).as("stage_no"), lit("token_shape").as("stage"),
            $"c3".as("rows_out"), ($"c2" - $"c3").as("dropped"), $"c2".as("rows_in")),
          struct(lit(4).as("stage_no"), lit("exact_dedup").as("stage"),
            $"c4".as("rows_out"), ($"c3" - $"c4").as("dropped"), $"c3".as("rows_in"))))
          .as("r"))
        stages.select(
          $"r.stage_no".cast("int").as("stage_no"), $"r.stage",
          $"r.rows_out", $"r.dropped",
          when($"r.rows_in" > 0, $"r.rows_out" * lit(1.0) / $"r.rows_in")
            .as("retention"))
          .orderBy($"stage_no")
      }),

    // Curriculum schedule: every doc assigned to one of three
    // easy→hard phases by token-length rank. The global rank is the
    // range-sharded [[Pipeline.globalRank]] (per-shard windows + one
    // count per shard — never a single-partition row_number), and the
    // phase boundary is exact integer arithmetic on that rank, so the
    // schedule is a deterministic total order end to end.
    QueryDef(
      "pl_curriculum",
      Some("""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        r AS (
          SELECT doc_id, n_tokens,
                 row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rank,
                 COUNT(*) OVER () AS n
          FROM t)
        SELECT doc_id, n_tokens,
               CAST(rank * 3 // n AS BIGINT) AS phase,
               CAST(rank + 1 AS BIGINT) AS pos
        FROM r
        ORDER BY pos
      """.trim),
      (s, d) => {
        import s.implicits._
        val t = documents(s, d)
          .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
        val n = t.agg(count(lit(1)).as("n"))
        Pipeline.globalRank(t, Seq($"n_tokens", $"doc_id"))
          .crossJoin(broadcast(n))
          .select($"doc_id", $"n_tokens",
            floor(($"rank" * 3).cast("double") / $"n").cast("long").as("phase"),
            ($"rank" + 1).as("pos"))
          .orderBy($"pos")
      }))
}
