package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus growth accounting and funnel timing: the Heaps-law
  * vocabulary-growth curve (how fast the token vocabulary grows as the
  * corpus is ingested — THE sizing input for tokenizer vocab budgets
  * and dedup-index capacity planning) and conversion-lag quantiles
  * (the time dimension ev_funnel's pure counts leave out).
  *
  * Both are integer-exact end to end: first-occurrence ranks, prefix
  * token totals, and lag seconds are integers; quantiles are exact
  * lower-rank selections, never interpolations.
  */
object GrowthLag {

  val defs: Seq[QueryDef] = Seq(

    // Vocabulary growth at 10 ingestion checkpoints (doc_id order):
    // after the first ceil(i·N/10) docs, how many tokens were seen and
    // how many distinct. One pass computes each token's FIRST doc rank
    // (a min aggregate); each checkpoint is then a conditional count —
    // a single scan of the vocabulary-sized table with 10 flags, not
    // 10 prefix scans. first-occurrence is monotone, so the curve is
    // non-decreasing by construction.
    QueryDef(
      "ta_heaps_law",
      Some("""
        WITH ranked AS (
          SELECT doc_id, text,
                 row_number() OVER (ORDER BY doc_id) AS r,
                 COUNT(*) OVER () AS nd
          FROM documents),
        tok AS (
          SELECT r, nd, unnest(string_split(text, ' ')) AS tok FROM ranked),
        firsts AS (
          SELECT tok, MIN(r) AS first_r FROM tok GROUP BY tok),
        dtok AS (
          SELECT r, COUNT(*) AS ntok FROM tok GROUP BY r),
        cuts AS (
          SELECT i, CAST(ceil(i * (SELECT MAX(nd) FROM ranked) / 10.0) AS BIGINT) AS k
          FROM (SELECT unnest(range(1, 11)) AS i)),
        vocab AS (
          SELECT c.i, c.k, COUNT(*) AS vocab
          FROM cuts c JOIN firsts f ON f.first_r <= c.k
          GROUP BY c.i, c.k),
        toks AS (
          SELECT c.i, SUM(d.ntok) AS cum_tokens
          FROM cuts c JOIN dtok d ON d.r <= c.k
          GROUP BY c.i)
        SELECT CAST(v.i AS BIGINT) AS checkpoint,
               CAST(v.k AS BIGINT) AS n_docs,
               CAST(t.cum_tokens AS BIGINT) AS cum_tokens,
               CAST(v.vocab AS BIGINT) AS vocab
        FROM vocab v JOIN toks t ON t.i = v.i
        ORDER BY checkpoint
      """.trim),
      (s, d) => {
        import s.implicits._
        val docs = documents(s, d)
        val ranked = Pipeline.globalRank(docs.select($"doc_id", $"text"), Seq($"doc_id"))
          .select($"doc_id", $"text", ($"rank" + 1).as("r"))
        val nd = docs.agg(count(lit(1)).as("nd"))
        val tok = ranked.select($"r", explode(split($"text", " ")).as("tok"))
        val firsts = tok.groupBy($"tok").agg(min($"r").as("first_r"))
        val dtok = tok.groupBy($"r").agg(count(lit(1)).as("ntok"))
        val cuts = s.range(1, 11).toDF("i")
          .crossJoin(broadcast(nd))
          .select($"i", ceil($"i" * $"nd" / lit(10.0)).cast("long").as("k"))
        val vocab = broadcast(cuts).join(firsts, $"first_r" <= $"k")
          .groupBy($"i", $"k").agg(count(lit(1)).as("vocab"))
        val toks = broadcast(cuts.select($"i".as("i2"), $"k".as("k2")))
          .join(dtok, $"r" <= $"k2")
          .groupBy($"i2").agg(sum($"ntok").as("cum_tokens"))
        vocab.join(toks, $"i" === $"i2")
          .select($"i".cast("long").as("checkpoint"), $"k".as("n_docs"),
            $"cum_tokens", $"vocab")
          .orderBy($"checkpoint")
      }),

    // Conversion lag: per user, seconds from FIRST view to the first
    // purchase after it; exact lower-rank quartiles over the converting
    // population. One window pass finds the first view, a min-filtered
    // aggregate the first qualifying purchase — no event×event join.
    QueryDef(
      "ev_conversion_lag",
      Some("""
        WITH fv AS (
          SELECT user_id, MIN(ts) AS first_view
          FROM events WHERE event_type = 'view' GROUP BY user_id),
        fp AS (
          SELECT e.user_id,
                 CAST(floor(epoch(MIN(e.ts))) AS BIGINT)
                   - CAST(floor(epoch(f.first_view)) AS BIGINT) AS lag_s
          FROM events e JOIN fv f ON f.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= f.first_view
          GROUP BY e.user_id, f.first_view),
        ranked AS (
          SELECT lag_s,
                 row_number() OVER (ORDER BY lag_s, user_id) AS rk,
                 COUNT(*) OVER () AS n
          FROM fp)
        SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
               CAST(MIN(CASE WHEN rk = (n + 3) // 4 THEN lag_s END) AS BIGINT) AS p25_s,
               CAST(MIN(CASE WHEN rk = (n + 1) // 2 THEN lag_s END) AS BIGINT) AS p50_s,
               CAST(MIN(CASE WHEN rk = (3 * n + 3) // 4 THEN lag_s END) AS BIGINT) AS p75_s,
               CAST(MAX(lag_s) AS BIGINT) AS max_s
        FROM ranked
      """.trim),
      (s, d) => {
        import s.implicits._
        val ev = events(s, d)
        val fv = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("first_view"))
        val fp = ev.filter($"event_type" === "purchase")
          .join(fv, "user_id")
          .filter($"ts" >= $"first_view")
          .groupBy($"user_id", $"first_view")
          .agg((unix_timestamp(min($"ts")) - unix_timestamp($"first_view")).as("lag_s"))
        // range-sharded global rank (ties broken by user_id for a total
        // order; the selected VALUE is tie-order-invariant either way)
        val n = fp.agg(count(lit(1)).as("n"))
        val ranked = Pipeline.globalRank(
            fp.select($"lag_s", $"user_id"), Seq($"lag_s", $"user_id"))
          .select($"lag_s", ($"rank" + 1).as("rk"))
          .crossJoin(broadcast(n))
        ranked.agg(
          max($"n").cast("long").as("n_converted"),
          min(when($"rk" === floor(($"n" + 3) / 4).cast("long"), $"lag_s")).cast("long").as("p25_s"),
          min(when($"rk" === floor(($"n" + 1) / 2).cast("long"), $"lag_s")).cast("long").as("p50_s"),
          min(when($"rk" === floor(($"n" * 3 + 3) / 4).cast("long"), $"lag_s")).cast("long").as("p75_s"),
          max($"lag_s").cast("long").as("max_s"))
      }))
}
