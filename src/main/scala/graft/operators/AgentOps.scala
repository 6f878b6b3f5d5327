package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's agent-data-plane operators (SURVEY.md §2) expressed
  * over the harness tables so each gets a DuckDB oracle. The typed
  * agent-domain API (memory/task/registry stores over their own
  * schemas) lives in `graft.memory` / `graft.task` / `graft.registry`;
  * these queries pin the *operator semantics* on data the oracle can see.
  */
object AgentOps {

  val defs: Seq[QueryDef] = Seq(

    // P1/P2: tail-N slice of an append-only log (memory.py:123-126).
    QueryDef(
      "ag_tail_records",
      Some("""
        SELECT event_id, user_id, event_type, value FROM (
          SELECT * FROM events ORDER BY event_id DESC LIMIT 10)
        ORDER BY event_id
      """.trim),
      (s, d) => {
        import s.implicits._
        events(s, d)
          .orderBy(desc("event_id")).limit(10)
          .select($"event_id", $"user_id", $"event_type", $"value")
          .orderBy($"event_id")
      }),

    // A5: latest-summary selection — value at max key (memory.py:119-121).
    QueryDef(
      "ag_latest_per_user",
      Some("""
        SELECT user_id,
               max_by(event_type, event_id) AS last_type,
               max_by(value, event_id) AS last_value,
               MAX(event_id) AS last_event_id
        FROM events GROUP BY user_id
        ORDER BY user_id
      """.trim),
      (s, d) => {
        import s.implicits._
        events(s, d).groupBy($"user_id")
          .agg(max_by($"event_type", $"event_id").as("last_type"),
            max_by($"value", $"event_id").as("last_value"),
            max($"event_id").as("last_event_id"))
          .orderBy($"user_id")
      }),

    // A7+A8/G4: topic upsert frequencies + capacity-eviction victim — min
    // by (frequency ASC, last_updated ASC) per group (memory.py:315-344).
    QueryDef(
      "ag_topic_eviction",
      Some("""
        SELECT user_id, event_type AS victim_topic, frequency, last_updated FROM (
          SELECT user_id, event_type, frequency, last_updated,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY frequency, last_updated, event_type) AS rn
          FROM (SELECT user_id, event_type, COUNT(*) AS frequency,
                       MAX(event_id) AS last_updated
                FROM events GROUP BY 1, 2))
        WHERE rn = 1
        ORDER BY user_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val topics = events(s, d).groupBy($"user_id", $"event_type")
          .agg(count(lit(1)).as("frequency"), max($"event_id").as("last_updated"))
        val w = Window.partitionBy($"user_id")
          .orderBy($"frequency", $"last_updated", $"event_type")
        topics.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_type".as("victim_topic"), $"frequency", $"last_updated")
          .orderBy($"user_id")
      }),

    // A9/G4: count-capped retention — keep the newest 5 per key
    // (memory.py:310-312, task.py:619-623).
    QueryDef(
      "ag_retention_cap",
      Some("""
        SELECT user_id, event_id, rn FROM (
          SELECT user_id, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events)
        WHERE rn <= 5
        ORDER BY user_id, rn
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy(desc("event_id"))
        events(s, d).withColumn("rn", row_number().over(w))
          .filter($"rn" <= 5)
          .select($"user_id", $"event_id", $"rn".cast("long").as("rn"))
          .orderBy($"user_id", $"rn")
      }),

    // U1/G5: registry union with last-writer-wins on key collision
    // (manager.py:220-231) — last order per customer wins.
    QueryDef(
      "ag_last_wins_registry",
      Some("""
        SELECT o_custkey, o_orderkey AS winning_order, o_orderstatus FROM (
          SELECT o_custkey, o_orderkey, o_orderstatus,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders)
        WHERE rn = 1
        ORDER BY o_custkey
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy(desc("o_orderdate"), desc("o_orderkey"))
        orders(s, d).withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"o_custkey", $"o_orderkey".as("winning_order"), $"o_orderstatus")
          .orderBy($"o_custkey")
      }),

    // P4: key point-lookup with pushdown (memory.py:257-261).
    QueryDef(
      "ag_point_lookup",
      Some("""
        SELECT p_partkey, p_name, p_brand, p_retailprice
        FROM part WHERE p_partkey IN (42, 142, 1042)
        ORDER BY p_partkey
      """.trim),
      (s, d) => {
        import s.implicits._
        part(s, d)
          .filter($"p_partkey".isin(42L, 142L, 1042L))
          .select($"p_partkey", $"p_name", $"p_brand", $"p_retailprice")
          .orderBy($"p_partkey")
      }),

    // P7: ignore-list filter (memory.py:196-197).
    QueryDef(
      "ag_ignore_filter",
      Some(s"""
        SELECT event_type, COUNT(*) AS n, ${sqlSum("value")} AS value_sum
        FROM events
        WHERE event_type NOT IN ('error', 'signup') AND event_id >= 100
        GROUP BY event_type
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        events(s, d)
          .filter(!$"event_type".isin("error", "signup") && $"event_id" >= 100)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), dsum($"value").as("value_sum"))
          .orderBy($"event_type")
      }),

    // F7/G6: type-coercion suite with Python semantics — "5.0" IS
    // int-convertible (utils.py:165-244; Spark's bare cast would null it).
    QueryDef(
      "ag_arg_coercion",
      Some("""
        SELECT event_id, raw,
               CASE WHEN regexp_matches(raw, '^-?[0-9]+(\.0*)?$')
                    THEN CAST(CAST(raw AS DOUBLE) AS BIGINT) END AS int_val,
               CASE WHEN regexp_matches(raw, '^-?[0-9]+(\.[0-9]*)?$')
                    THEN CAST(raw AS DOUBLE) END AS float_val,
               (CASE WHEN regexp_matches(raw, '^-?[0-9]+(\.0*)?$') THEN 'int'
                     WHEN regexp_matches(raw, '^-?[0-9]+(\.[0-9]*)?$') THEN 'float'
                     ELSE 'reject' END) AS coercion
        FROM (
          SELECT event_id,
                 json_extract_string(props, '$.k')
                   || CASE WHEN event_id % 3 = 0 THEN '.5'
                           WHEN event_id % 3 = 1 THEN '.0' ELSE '' END AS raw
          FROM events)
        ORDER BY event_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val intRe = "^-?[0-9]+(\\.0*)?$"
        val floatRe = "^-?[0-9]+(\\.[0-9]*)?$"
        events(s, d)
          .select($"event_id",
            concat(get_json_object($"props", "$.k"),
              when($"event_id" % 3 === 0, ".5")
                .when($"event_id" % 3 === 1, ".0").otherwise("")).as("raw"))
          .select($"event_id", $"raw",
            when($"raw".rlike(intRe), $"raw".cast("double").cast("long")).as("int_val"),
            when($"raw".rlike(floatRe), $"raw".cast("double")).as("float_val"),
            when($"raw".rlike(intRe), "int")
              .when($"raw".rlike(floatRe), "float")
              .otherwise("reject").as("coercion"))
          .orderBy($"event_id")
      }),

    // F6/G3: marker-span extraction with the 20-token fallback when the
    // end marker is missing (task.py:263-285).
    QueryDef(
      "ag_marker_extraction",
      Some("""
        SELECT doc_id, start_pos,
               CASE WHEN start_pos = 0 THEN NULL
                    WHEN end_off > 0 THEN substring(text, start_pos, end_off - 1)
                    ELSE array_to_string(string_split(substring(text, start_pos), ' ')[1:20], ' ')
               END AS extracted
        FROM (
          SELECT doc_id, text,
                 CAST(instr(text, 'join') AS BIGINT) AS start_pos,
                 CAST(instr(substring(text, instr(text, 'join')), 'merge') AS BIGINT) AS end_off
          FROM documents)
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", $"text",
            instr($"text", "join").cast("long").as("start_pos"),
            instr(expr("substring(text, instr(text, 'join'))"), "merge")
              .cast("long").as("end_off"))
          .select($"doc_id", $"start_pos",
            when($"start_pos" === 0, lit(null).cast("string"))
              .when($"end_off" > 0,
                expr("substring(text, start_pos, end_off - 1)"))
              .otherwise(concat_ws(" ",
                slice(split(expr("substring(text, start_pos)"), " "), 1, 20)))
              .as("extracted"))
          .orderBy($"doc_id")
      }),

    // F4/Q6: fenced-JSON extraction round trip (utils.py:134-163) — wrap
    // props in a code fence, then recover content and JSON.
    QueryDef(
      "ag_fenced_json",
      Some("""
        SELECT event_id, content, fenced_json,
               CAST(json_extract_string(fenced_json, '$.k') AS BIGINT) AS k
        FROM (
          SELECT event_id,
                 string_split('before ' || chr(10) || '```json' || chr(10) || props
                              || chr(10) || '```' || chr(10) || ' after', '```')[2] AS raw_block,
                 string_split('before ' || chr(10) || '```json' || chr(10) || props
                              || chr(10) || '```' || chr(10) || ' after', '```')[1]
                   || string_split('before ' || chr(10) || '```json' || chr(10) || props
                              || chr(10) || '```' || chr(10) || ' after', '```')[3] AS content,
                 regexp_replace(regexp_replace(
                   string_split('before ' || chr(10) || '```json' || chr(10) || props
                              || chr(10) || '```' || chr(10) || ' after', '```')[2],
                   '^json', '', 'g'), chr(10), '', 'g') AS fenced_json
          FROM events)
        ORDER BY event_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val wrapped = concat(lit("before \n```json\n"), $"props", lit("\n```\n after"))
        val parts = split(wrapped, "```")
        events(s, d)
          .select($"event_id",
            element_at(parts, 2).as("raw_block"),
            concat(element_at(parts, 1), element_at(parts, 3)).as("content"),
            regexp_replace(regexp_replace(element_at(parts, 2), "^json", ""), "\n", "")
              .as("fenced_json"))
          .select($"event_id", $"content", $"fenced_json",
            get_json_object($"fenced_json", "$.k").cast("long").as("k"))
          .orderBy($"event_id")
      }),

    // A2/A3/G7: per-entity counts across two child relations
    // (app.py:140-175 logs_count/files_count views).
    QueryDef(
      "ag_per_entity_counts",
      Some("""
        SELECT c.c_custkey,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(l.n_items, 0) AS n_items
        FROM customer c
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
          ON c.c_custkey = o.o_custkey
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_items
                   FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1) l
          ON c.c_custkey = l.o_custkey
        ORDER BY c.c_custkey
      """.trim),
      (s, d) => {
        import s.implicits._
        val o = orders(s, d).groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
        val l = orders(s, d).join(lineitem(s, d), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey").agg(count(lit(1)).as("n_items"))
        customer(s, d)
          .join(o, $"c_custkey" === o("o_custkey"), "left")
          .join(l, $"c_custkey" === l("o_custkey"), "left")
          .select($"c_custkey",
            coalesce($"n_orders", lit(0L)).as("n_orders"),
            coalesce($"n_items", lit(0L)).as("n_items"))
          .orderBy($"c_custkey")
      }),

    // T3/T4: truncation with ellipsis (task.py:505-509, 60-char titles).
    QueryDef(
      "ag_truncate_titles",
      Some("""
        SELECT doc_id,
               CASE WHEN length(text) > 60 THEN substring(text, 1, 60) || '...'
                    ELSE text END AS title,
               length(text) > 60 AS is_truncated
        FROM documents
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id",
            when(length($"text") > 60, concat(substring($"text", 1, 60), lit("...")))
              .otherwise($"text").as("title"),
            (length($"text") > 60).as("is_truncated"))
          .orderBy($"doc_id")
      })
  )
}
