package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of and range joins over the events log (SURVEY.md §2.3 "not
  * present in reference; built-in via inequality conditions / window
  * reformulation" — the v3 extension made concrete).
  *
  * Scale design: the as-of join is NOT an inequality join — it is the
  * union-and-window reformulation (one shuffle by user, one ordered
  * scan), which at 100 TB is a single sort-merge pass instead of a
  * quadratic per-user band join. The range join bounds its band with an
  * equi-key (user_id) so the shuffled join only bands within users.
  */
object JoinsExtra {

  val defs: Seq[QueryDef] = Seq(

    // As-of join: for each click, the most recent purchase by the same
    // user at or before it (event_id is the unique monotone time axis).
    QueryDef(
      "jx_asof_join",
      Some("""
        SELECT c.event_id, c.user_id,
               (SELECT MAX(p.event_id) FROM events p
                WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
                  AND p.event_id <= c.event_id) AS asof_purchase_id
        FROM events c
        WHERE c.event_type = 'click'
        ORDER BY c.event_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("asof_purchase_id",
            last(when($"event_type" === "purchase", $"event_id"), ignoreNulls = true)
              .over(w))
          .filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"asof_purchase_id")
          .orderBy($"event_id")
      }),

    // Range join: events of the same user within the 300 s preceding
    // each error (inclusive bounds; the error row itself excluded).
    QueryDef(
      "jx_range_join",
      Some(s"""
        SELECT e.event_id, e.user_id,
               COUNT(b.event_id) AS n_preceding,
               ${sqlSum("b.value")} AS preceding_value
        FROM events e
        LEFT JOIN events b
          ON b.user_id = e.user_id
         AND b.event_id <> e.event_id
         AND CAST(floor(epoch(b.ts)) AS BIGINT)
               BETWEEN CAST(floor(epoch(e.ts)) AS BIGINT) - 300
                   AND CAST(floor(epoch(e.ts)) AS BIGINT)
        WHERE e.event_type = 'error'
        GROUP BY e.event_id, e.user_id
        ORDER BY e.event_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val ev = events(s, d).withColumn("t", unix_timestamp($"ts"))
        val errors = ev.filter($"event_type" === "error")
          .select($"event_id", $"user_id", $"t")
        val others = ev.select($"event_id".as("b_id"), $"user_id".as("b_user"),
          $"t".as("b_t"), $"value".as("b_value"))
        errors
          .join(others,
            $"b_user" === $"user_id" && $"b_id" =!= $"event_id" &&
              $"b_t".between($"t" - 300, $"t"), "left")
          .groupBy($"event_id", $"user_id")
          .agg(count($"b_id").as("n_preceding"),
            dsum($"b_value").as("preceding_value"))
          .orderBy($"event_id")
      }),

    // Nearest join: for each click, the purchase by the same user
    // CLOSEST on the time axis in EITHER direction (ties → the earlier
    // purchase). Same scale shape as the as-of join — no inequality
    // join anywhere: one shuffle by user, one ordered scan, with the
    // backward candidate from a preceding-frame window and the forward
    // candidate from a following-frame window; the nearest pick is then
    // a row-local comparison. The oracle states the same semantics as
    // two correlated extrema (DuckDB's privilege at oracle scale).
    QueryDef(
      "jx_nearest_join",
      Some("""
        WITH c AS (
          SELECT event_id, user_id,
                 (SELECT MAX(p.event_id) FROM events p
                  WHERE p.user_id = c0.user_id AND p.event_type = 'purchase'
                    AND p.event_id <= c0.event_id) AS prev_p,
                 (SELECT MIN(p.event_id) FROM events p
                  WHERE p.user_id = c0.user_id AND p.event_type = 'purchase'
                    AND p.event_id > c0.event_id) AS next_p
          FROM events c0
          WHERE c0.event_type = 'click')
        SELECT event_id, user_id,
               CASE WHEN prev_p IS NULL THEN next_p
                    WHEN next_p IS NULL THEN prev_p
                    WHEN event_id - prev_p <= next_p - event_id THEN prev_p
                    ELSE next_p END AS nearest_purchase_id
        FROM c
        ORDER BY event_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val wb = Window.partitionBy($"user_id").orderBy($"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wf = Window.partitionBy($"user_id").orderBy($"event_id")
          .rowsBetween(1, Window.unboundedFollowing)
        events(s, d)
          .withColumn("prev_p",
            last(when($"event_type" === "purchase", $"event_id"), ignoreNulls = true)
              .over(wb))
          .withColumn("next_p",
            first(when($"event_type" === "purchase", $"event_id"), ignoreNulls = true)
              .over(wf))
          .filter($"event_type" === "click")
          .select($"event_id", $"user_id",
            when($"prev_p".isNull, $"next_p")
              .when($"next_p".isNull, $"prev_p")
              .when($"event_id" - $"prev_p" <= $"next_p" - $"event_id", $"prev_p")
              .otherwise($"next_p").as("nearest_purchase_id"))
          .orderBy($"event_id")
      }),

    // §2.10 — the registered UDF surface exercised through spark.sql:
    // clean_string + keyword_score over documents, oracle-translated to
    // DuckDB built-ins (the UDFs' semantics are SQL-expressible here by
    // construction; the lenient-JSON/coercion UDFs are covered by the
    // ag_* queries and unit specs).
    QueryDef(
      "ud_sql_udfs",
      Some("""
        SELECT doc_id,
               regexp_replace(lower(text), '[^\w\s]', '', 'g') AS cleaned,
               CAST((CASE WHEN instr(regexp_replace(lower(text), '[^\w\s]', '', 'g'), 'spark') > 0 THEN 1 ELSE 0 END
                   + CASE WHEN instr(regexp_replace(lower(text), '[^\w\s]', '', 'g'), 'shuffle') > 0 THEN 1 ELSE 0 END
                   + CASE WHEN instr(regexp_replace(lower(text), '[^\w\s]', '', 'g'), 'window') > 0 THEN 1 ELSE 0 END) AS BIGINT) AS score
        FROM documents
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        graft.functions.Udfs.registerAll(s)
        documents(s, d).createOrReplaceTempView("documents_v")
        s.sql("""
          SELECT doc_id,
                 clean_string(text) AS cleaned,
                 CAST(keyword_score(clean_string(text), array('spark', 'shuffle', 'window')) AS BIGINT) AS score
          FROM documents_v
          ORDER BY doc_id""")
      })
  )
}
