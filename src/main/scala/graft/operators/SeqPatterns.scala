package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.functions._

/** Sequential-pattern mining (the PrefixSpan family, Pei et al.
  * ICDE'01) over per-user event streams: which orderings of event
  * types do users actually traverse, as user-support counts — the
  * readout behind funnel DESIGN (ev_funnel measures a funnel you
  * already chose; this surfaces which ones exist).
  *
  * Subsequence containment over a per-user total order (event_id — the
  * same order key the sessionizer uses) reduces to interval algebra on
  * per-(user, type) extremes: "a then b" ⟺ first(a) < last(b), and
  * "a then b then c" ⟺ some b-occurrence lies strictly between
  * first(a) and last(c). So support counting is ONE groupBy to the
  * (user, type) extremes table (5 rows/user), an equi-join back to
  * events on user_id with the range tests as join residuals (never a
  * join ON a bare inequality), and a distinct-user count per pattern —
  * fan-out ≤ |types|² per event, linear in the stream at any scale.
  * Output: all 2-sequences plus the top-10 3-sequences — |types|²+10
  * rows however large the corpus.
  */
object SeqPatterns {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "ev_seq_patterns",
      Some("""
        WITH f AS (
          SELECT user_id, event_type,
                 MIN(event_id) AS first_id, MAX(event_id) AS last_id
          FROM events GROUP BY 1, 2),
        u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
        s2 AS (
          SELECT a.event_type AS ea, b.event_type AS eb,
                 COUNT(*) AS sup
          FROM f a JOIN f b ON a.user_id = b.user_id
          WHERE a.first_id < b.last_id
          GROUP BY 1, 2),
        s3 AS (
          SELECT a.event_type AS ea, e.event_type AS eb, c.event_type AS ec,
                 COUNT(DISTINCT e.user_id) AS sup
          FROM events e
          JOIN f a ON a.user_id = e.user_id
          JOIN f c ON c.user_id = e.user_id
          WHERE a.first_id < e.event_id AND e.event_id < c.last_id
          GROUP BY 1, 2, 3),
        top3 AS (
          SELECT ea, eb, ec, sup FROM s3
          ORDER BY sup DESC, ea, eb, ec LIMIT 10)
        SELECT kind, pat, n_users, frac FROM (
          SELECT '2seq' AS kind, ea || '>' || eb AS pat,
                 CAST(sup AS BIGINT) AS n_users,
                 sup * 1.0 / n_users AS frac
          FROM s2 CROSS JOIN u
          UNION ALL
          SELECT '3seq', ea || '>' || eb || '>' || ec,
                 CAST(sup AS BIGINT), sup * 1.0 / n_users
          FROM top3 CROSS JOIN u)
        ORDER BY kind, n_users DESC, pat
      """.trim),
      (s, d) => {
        import s.implicits._
        val ev = events(s, d).select($"user_id", $"event_type", $"event_id")
        val f = ev.groupBy($"user_id", $"event_type")
          .agg(min($"event_id").as("first_id"), max($"event_id").as("last_id"))
          .localCheckpoint() // three consumers: both s2 sides + s3's two
        val nUsers = ev.select($"user_id").distinct().count()
        val s2 = f.as("a").join(f.as("b"),
            $"a.user_id" === $"b.user_id" && $"a.first_id" < $"b.last_id")
          .groupBy($"a.event_type".as("ea"), $"b.event_type".as("eb"))
          .agg(count(lit(1)).as("sup"))
        val s3 = ev.as("e")
          .join(f.as("a"), $"a.user_id" === $"e.user_id" &&
            $"a.first_id" < $"e.event_id")
          .join(f.as("c"), $"c.user_id" === $"e.user_id" &&
            $"e.event_id" < $"c.last_id")
          .groupBy($"a.event_type".as("ea"), $"e.event_type".as("eb"),
            $"c.event_type".as("ec"))
          .agg(countDistinct($"e.user_id").as("sup"))
        val top3 = s3.orderBy($"sup".desc, $"ea", $"eb", $"ec").limit(10)
        val out2 = s2.select(lit("2seq").as("kind"),
          concat($"ea", lit(">"), $"eb").as("pat"),
          $"sup".cast("long").as("n_users"),
          ($"sup" * lit(1.0) / lit(nUsers)).as("frac"))
        val out3 = top3.select(lit("3seq").as("kind"),
          concat($"ea", lit(">"), $"eb", lit(">"), $"ec").as("pat"),
          $"sup".cast("long").as("n_users"),
          ($"sup" * lit(1.0) / lit(nUsers)).as("frac"))
        out2.union(out3).orderBy($"kind", $"n_users".desc, $"pat")
      }))
}
