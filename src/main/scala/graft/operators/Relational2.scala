package graft.operators

import graft.QueryDef
import graft.det._
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second relational tranche: correlated-subquery decorrelation, cube,
  * and pivot — the remaining classic shapes of the harness surface.
  *
  * Scale notes: the Q17-shaped query is written as an explicit
  * aggregate-then-join (what Catalyst's decorrelation produces anyway),
  * so the per-part average is computed once in a partial+final hash agg
  * and joined back — never a per-row subquery execution. The pivot is
  * conditional aggregation: one scan, one shuffle, map-side combine.
  */
object Relational2 {

  /** Shared SQL for q30 — runnable verbatim by Spark and DuckDB. */
  val subquerySql: String = """
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_totalprice >
                       (SELECT MAX(o_totalprice) FROM orders) * CAST(0.5 AS DOUBLE))
                AS BIGINT) AS n_big
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice >
                        (SELECT MAX(o_totalprice) FROM orders) * CAST(0.5 AS DOUBLE))
      AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
    ORDER BY c_custkey
  """.trim

  /** Shared SQL for q31 — LATERAL correlated top-1-per-row, runnable
    * verbatim by Spark and DuckDB. The classic "each customer's best
    * order" idiom: the lateral subquery sees the outer row, orders its
    * matches, and keeps one — Catalyst decorrelates it to a ranked
    * window join rather than executing per-row. */
  val lateralSql: String = """
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
           CAST(t.o_orderkey AS BIGINT) AS best_order,
           t.o_totalprice AS best_price
    FROM customer c,
    LATERAL (SELECT o.o_orderkey, o.o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o.o_totalprice DESC, o.o_orderkey
             LIMIT 1) t
    WHERE c.c_nationkey < 5
    ORDER BY c_custkey
  """.trim

  /** Shared SQL for q32 — WITH RECURSIVE, runnable verbatim by Spark
    * (4.x `UnionLoopExec`) and DuckDB. Multi-hop reachability over the
    * event-type transition graph: edges = the 6 most frequent observed
    * transitions (deterministic count/src/dst ranking), walk = bounded-
    * depth recursion (the depth guard terminates even though the graph
    * has cycles), result = min hop count per reachable (origin, node).
    * Each iteration is one distributed join of the frontier against the
    * edge table — the recursion's state is the frontier, never the
    * driver. */
  val recursiveSql: String = """
    WITH RECURSIVE edges AS (
      SELECT src, dst FROM (
        SELECT src, dst, row_number() OVER (ORDER BY cnt DESC, src, dst) AS rn
        FROM (
          SELECT event_type AS src, next_type AS dst, COUNT(*) AS cnt FROM (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
            FROM events) t
          WHERE next_type IS NOT NULL
          GROUP BY src, dst) c) r
      WHERE rn <= 6),
    walk AS (
      SELECT src AS origin, dst AS node, 1 AS depth FROM edges
      UNION ALL
      SELECT w.origin, e.dst, w.depth + 1
      FROM walk w JOIN edges e ON w.node = e.src
      WHERE w.depth < 4
    )
    SELECT origin, node, CAST(MIN(depth) AS BIGINT) AS min_hops
    FROM walk GROUP BY origin, node ORDER BY origin, node
  """.trim

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q17
    // TPC-H Q17 shape: lineitems with quantity below 20% of their
    // part's average quantity; revenue they represent.
    QueryDef(
      "q17_small_quantity_revenue",
      Some("""
        SELECT p_brand, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
        GROUP BY p_brand
        ORDER BY p_brand
      """.trim),
      (s, d) => {
        import s.implicits._
        val li = lineitem(s, d)
        val avgQty = li.groupBy($"l_partkey".as("ap_partkey"))
          .agg((avg($"l_quantity") * 0.2).as("qty_threshold"))
        li.join(avgQty, $"l_partkey" === $"ap_partkey")
          .filter($"l_quantity" < $"qty_threshold")
          .join(part(s, d), $"p_partkey" === $"l_partkey")
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n_items"),
            (dsum($"l_extendedprice") / 7.0).as("avg_yearly"))
          .orderBy($"p_brand")
      }),

    // ---------------------------------------------------------------- q18
    // Cube over (returnflag, shipmode): all four grouping combinations.
    QueryDef(
      "q18_cube_lineitem",
      Some(s"""
        SELECT COALESCE(rf, 'ALL') AS rf,
               COALESCE(qb, 'ALL') AS qb,
               COUNT(*) AS n, ${sqlSum("l_extendedprice")} AS price_sum
        FROM (SELECT l_returnflag AS rf,
                     CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS qb,
                     l_extendedprice
              FROM lineitem)
        GROUP BY CUBE(rf, qb)
        ORDER BY rf, qb
      """.trim),
      (s, d) => {
        import s.implicits._
        lineitem(s, d)
          .select($"l_returnflag".as("rf"),
            when($"l_quantity" > 25, "big").otherwise("small").as("qb"),
            $"l_extendedprice")
          .cube($"rf", $"qb")
          .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("price_sum"))
          .select(coalesce($"rf", lit("ALL")).as("rf"),
            coalesce($"qb", lit("ALL")).as("qb"), $"n", $"price_sum")
          .orderBy($"rf", $"qb")
      }),

    // ---------------------------------------------------------------- q26
    // The full ranking-function family: dense_rank, ntile, percent_rank,
    // cume_dist (row_number/rank covered by q07; deterministic total
    // order within each partition).
    QueryDef(
      "q26_rank_funcs",
      Some("""
        SELECT o_orderkey, o_orderpriority,
               CAST(dense_rank() OVER w AS BIGINT) AS drk,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               percent_rank() OVER w AS prk,
               cume_dist() OVER w AS cd
        FROM orders
        WHERE o_orderkey % 20 = 0
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderkey
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice", $"o_orderkey")
        orders(s, d)
          .filter($"o_orderkey" % 20 === 0)
          .select($"o_orderkey", $"o_orderpriority",
            dense_rank().over(w).cast("long").as("drk"),
            ntile(4).over(w).cast("long").as("quartile"),
            percent_rank().over(w).as("prk"),
            cume_dist().over(w).as("cd"))
          .orderBy($"o_orderkey")
      }),

    // ---------------------------------------------------------------- q27
    // Positional generator: posexplode → (pos, token) rows; the UDTF
    // shape with ordinality (Spark Generate operator).
    QueryDef(
      "q27_posexplode",
      Some("""
        SELECT doc_id, CAST(p.i AS BIGINT) AS pos, p.tok
        FROM (
          SELECT doc_id, unnest(list_transform(string_split(text, ' '),
                   (tok, i) -> {'i': i - 1, 'tok': tok})) AS p
          FROM documents WHERE doc_id < 20)
        ORDER BY doc_id, pos
      """.trim),
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .filter($"doc_id" < 20)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "tok")))
          .select($"doc_id", $"pos".cast("long").as("pos"), $"tok")
          .orderBy($"doc_id", $"pos")
      }),

    // ---------------------------------------------------------------- q24
    // Ordered string aggregation: deterministic via sort-before-join
    // (collect_list order is nondeterministic under parallelism; the
    // array_sort makes the result partitioning-invariant).
    QueryDef(
      "q24_string_agg",
      Some("""
        SELECT n_name,
               string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
               COUNT(*) AS n
        FROM (SELECT DISTINCT n_name, c_mktsegment
              FROM customer JOIN nation ON c_nationkey = n_nationkey)
        GROUP BY n_name
        ORDER BY n_name
      """.trim),
      (s, d) => {
        import s.implicits._
        customer(s, d)
          .join(broadcast(nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .select($"n_name", $"c_mktsegment").distinct()
          .groupBy($"n_name")
          .agg(
            array_join(array_sort(collect_list($"c_mktsegment")), ",").as("segments"),
            count(lit(1)).as("n"))
          .orderBy($"n_name")
      }),

    // ---------------------------------------------------------------- q25
    // Date/interval arithmetic: datediff to a fixed epoch, month adds,
    // year/quarter extraction, month truncation.
    QueryDef(
      "q25_date_math",
      Some("""
        SELECT o_orderkey,
               CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
               strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        FROM orders
        WHERE o_orderkey % 50 = 0
        ORDER BY o_orderkey
      """.trim),
      (s, d) => {
        import s.implicits._
        orders(s, d)
          .filter($"o_orderkey" % 50 === 0)
          .select($"o_orderkey",
            datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("long").as("days_since"),
            date_format(add_months($"o_orderdate", 3), "yyyy-MM-dd").as("plus_3m"),
            year($"o_orderdate").cast("long").as("yr"),
            quarter($"o_orderdate").cast("long").as("qtr"),
            date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"))
          .orderBy($"o_orderkey")
      }),

    // ---------------------------------------------------------------- q22
    // Explicit GROUPING SETS (beyond rollup/cube): chosen combinations
    // only, via spark.sql — the SQL front door of the same hash-agg.
    QueryDef(
      "q22_grouping_sets",
      Some(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS n, ${sqlSum("l_quantity")} AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY rf, ls
      """.trim),
      (s, d) => {
        lineitem(s, d).createOrReplaceTempView("lineitem_v")
        s.sql(s"""
          SELECT COALESCE(l_returnflag, 'ALL') AS rf,
                 COALESCE(l_linestatus, 'ALL') AS ls,
                 COUNT(*) AS n, ${sqlSum("l_quantity")} AS qty
          FROM lineitem_v
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY rf, ls""")
      }),

    // ---------------------------------------------------------------- q23
    // Array scalar functions over the token arrays: sort/slice/
    // contains/overlap/union size — all codegen'd collection ops.
    QueryDef(
      "q23_array_funcs",
      Some("""
        SELECT doc_id,
               array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted,
               list_contains(string_split(text, ' '), 'spark') AS has_spark,
               CAST(len(list_distinct(string_split(text, ' ') || string_split(lang, ' '))) AS BIGINT) AS union_size,
               list_sort(string_split(text, ' '))[1] AS min_tok,
               list_sort(string_split(text, ' '))[-1] AS max_tok
        FROM documents
        ORDER BY doc_id
      """.trim),
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select($"doc_id", split($"text", " ").as("tk"), split($"lang", " ").as("lg"))
          .select($"doc_id",
            concat_ws(",", slice(array_sort($"tk"), 1, 3)).as("first3_sorted"),
            array_contains($"tk", "spark").as("has_spark"),
            size(array_distinct(concat($"tk", $"lg"))).cast("long").as("union_size"),
            array_min($"tk").as("min_tok"),
            array_max($"tk").as("max_tok"))
          .orderBy($"doc_id")
      }),

    // ---------------------------------------------------------------- q20
    // Exact quantiles (sort-based percentile, not a sketch) per group.
    QueryDef(
      "q20_quantiles",
      Some("""
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.75) AS p75,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.trim),
      (s, d) => {
        import s.implicits._
        orders(s, d)
          .groupBy($"o_orderpriority")
          .agg(
            percentile($"o_totalprice", lit(0.25)).as("p25"),
            percentile($"o_totalprice", lit(0.5)).as("p50"),
            percentile($"o_totalprice", lit(0.75)).as("p75"),
            count(lit(1)).as("n"))
          .orderBy($"o_orderpriority")
      }),

    // ---------------------------------------------------------------- q21
    // The canonical wordcount: explode tokens → count → top-20 with a
    // deterministic tiebreak (generator + agg + TakeOrderedAndProject).
    QueryDef(
      "q21_wordcount",
      Some("""
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20
      """.trim),
      (s, d) => {
        import s.implicits._
        documents(s, d)
          .select(explode(split($"text", " ")).as("tok"))
          .groupBy($"tok")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("tok"))
          .limit(20)
      }),

    // ---------------------------------------------------------------- q19
    // Pivot: order counts per month × priority, via Spark's pivot and a
    // conditional-aggregation oracle (one scan in both engines).
    QueryDef(
      "q19_pivot_orders", {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val cols = prios.map { p =>
          val alias = "p" + p.charAt(0)
          s"CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '$p' THEN 1 END), 0) AS BIGINT) AS $alias"
        }.mkString(",\n               ")
        Some(s"""
          SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
                 $cols
          FROM orders
          GROUP BY 1
          ORDER BY 1
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        orders(s, d)
          .groupBy(date_format($"o_orderdate", "yyyy-MM").as("order_month"))
          .pivot("o_orderpriority", prios)
          .agg(count(lit(1)))
          .select($"order_month" +: prios.map(p =>
            coalesce(col(s"`$p`"), lit(0L)).as("p" + p.charAt(0))): _*)
          .orderBy($"order_month")
      }),

    // ---------------------------------------------------------------- q28
    // Unpivot (pivot's inverse): lineitem measures melt to long form via
    // Spark's native Unpivot node (ONE scan, a generator — not the 4
    // scans the oracle's UNION ALL formulation spells out).
    QueryDef(
      "q28_unpivot_lineitem", {
        val measures = Seq("quantity" -> "l_quantity",
          "extendedprice" -> "l_extendedprice",
          "discount" -> "l_discount", "tax" -> "l_tax")
        val arms = measures.map { case (m, c) =>
          s"SELECT '$m' AS measure, $c AS value FROM lineitem"
        }.mkString(" UNION ALL ")
        Some(s"""
          SELECT measure, COUNT(*) AS n, ${sqlSum("value")} AS value_sum
          FROM ($arms)
          GROUP BY measure
          ORDER BY measure
        """.trim)
      },
      (s, d) => {
        import s.implicits._
        lineitem(s, d)
          .select($"l_quantity".as("quantity"), $"l_extendedprice".as("extendedprice"),
            $"l_discount".as("discount"), $"l_tax".as("tax"))
          .unpivot(Array.empty, Array($"quantity", $"extendedprice", $"discount", $"tax"),
            "measure", "value")
          .groupBy($"measure")
          .agg(count(lit(1)).as("n"), dsum($"value").as("value_sum"))
          .orderBy($"measure")
      }),

    // ---------------------------------------------------------------- q29
    // Full outer join — the one join type the rest of the surface
    // doesn't exercise: deliberately mismatched key subsets so rows
    // survive from the left only, right only, and both, with the
    // null-side flags made explicit.
    QueryDef(
      "q29_full_outer",
      Some("""
        WITH c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0),
        o AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
              WHERE o_custkey % 3 = 0 GROUP BY 1)
        SELECT COALESCE(c_custkey, o_custkey) AS custkey,
               c_mktsegment,
               CAST(COALESCE(n_orders, -1) AS BIGINT) AS n_orders,
               (c_custkey IS NULL) AS cust_missing,
               (o_custkey IS NULL) AS orders_missing
        FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        ORDER BY custkey
      """.trim),
      (s, d) => {
        import s.implicits._
        val c = customer(s, d).filter($"c_custkey" % 2 === 0)
          .select($"c_custkey", $"c_mktsegment")
        val o = orders(s, d).filter($"o_custkey" % 3 === 0)
          .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
        c.join(o, $"c_custkey" === $"o_custkey", "full_outer")
          .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
            $"c_mktsegment",
            coalesce($"n_orders", lit(-1L)).as("n_orders"),
            $"c_custkey".isNull.as("cust_missing"),
            $"o_custkey".isNull.as("orders_missing"))
          .orderBy($"custkey")
      }),

    // ---------------------------------------------------------------- q30
    // Subquery surface through the SQL entry point: uncorrelated scalar
    // (threshold), correlated EXISTS (decorrelates to a semi join),
    // IN-subquery (semi join), and a correlated scalar COUNT (left
    // outer + agg after Catalyst decorrelation). One SQL text serves
    // as BOTH the Spark program and the DuckDB oracle, pinning that
    // the engine's SQL dialect surface agrees with ANSI on these
    // shapes. Threshold is max·½ (exact scaling of an exact max) —
    // cross-engine identical where an AVG of doubles would not be.
    QueryDef(
      "q30_subqueries",
      Some(Relational2.subquerySql),
      (s, d) => {
        customer(s, d).createOrReplaceTempView("customer")
        orders(s, d).createOrReplaceTempView("orders")
        nation(s, d).createOrReplaceTempView("nation")
        s.sql(Relational2.subquerySql)
      }),

    // ---------------------------------------------------------------- q31
    QueryDef(
      "q31_lateral",
      Some(Relational2.lateralSql),
      (s, d) => {
        customer(s, d).createOrReplaceTempView("customer")
        orders(s, d).createOrReplaceTempView("orders")
        s.sql(Relational2.lateralSql)
      }),

    // ---------------------------------------------------------------- q32
    QueryDef(
      "q32_recursive_cte",
      Some(Relational2.recursiveSql),
      (s, d) => {
        events(s, d).createOrReplaceTempView("events")
        s.sql(Relational2.recursiveSql)
      }),

    // ---------------------------------------------------------------- q33
    // Column profiling — the stats sweep every ingestion pipeline runs
    // before anything else: per column, row/null/distinct counts and
    // min/max (as strings, so one schema serves every type). Two scans,
    // both map-side combining: (1) the simple aggregates (counts,
    // typed min/max) in one aggregation; (2) the seven exact distinct
    // counts via a MELT — explode each row into (column, value-string)
    // pairs, dedup with a hash aggregate, count per column. Putting
    // all seven COUNT(DISTINCT)s in one aggregation instead plans as
    // an 8× Expand of the whole fact table (measured 10.7s vs ~2s at
    // sf0.1); the melt shuffles only per-partition-distinct pairs.
    // Min/max stay typed before the string cast — a lexicographic
    // min over stringified ints would be wrong. (The oracle's 7-way
    // UNION ALL is the quadratic-is-fine-oracle-side formulation.)
    QueryDef(
      "q33_column_profile", {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus", "l_shipdate")
        val blocks = cols.map { c =>
          s"""SELECT '$c' AS column_name,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
                 CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
                 CAST(MIN($c) AS VARCHAR) AS min_val,
                 CAST(MAX($c) AS VARCHAR) AS max_val
          FROM lineitem"""
        }
        Some(s"""
        SELECT * FROM (${blocks.mkString("\n          UNION ALL ")})
        ORDER BY column_name
      """.trim)
      },
      (s, d) => {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus", "l_shipdate")
        val li = lineitem(s, d)
        val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
          Seq((count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
            min(col(c)).cast("string").as(s"${c}__min"),
            max(col(c)).cast("string").as(s"${c}__max"))
        }
        val wide = li.agg(aggs.head, aggs.tail: _*)
        val rows = cols.map { c =>
          struct(lit(c).as("column_name"), col("n_rows"),
            col(s"${c}__nulls").as("n_nulls"),
            col(s"${c}__min").as("min_val"),
            col(s"${c}__max").as("max_val"))
        }
        val simple = wide.select(explode(array(rows: _*)).as("r"))
          .select(col("r.column_name").as("column_name"), col("r.n_rows").as("n_rows"),
            col("r.n_nulls").as("n_nulls"),
            col("r.min_val").as("min_val"), col("r.max_val").as("max_val"))
        val melted = li.select(explode(array(cols.map { c =>
            struct(lit(c).as("column_name"), col(c).cast("string").as("v"))
          }: _*)).as("p"))
          .select(col("p.column_name").as("column_name"), col("p.v").as("v"))
          .filter(col("v").isNotNull)
          .groupBy(col("column_name"), col("v")).agg(count(lit(1)))
          .groupBy(col("column_name")).agg(count(lit(1)).as("n_distinct"))
        simple.join(melted, "column_name")
          .select(col("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_val"), col("max_val"))
          .orderBy(col("column_name"))
      }),

    // MapType function surface (§2.10): per-user event profiles held
    // as a MAP column — map_from_entries over the grouped counts, then
    // map_keys/map_values/element_at/map_entries consumed by
    // higher-order functions. The map is row-local plumbing: the plan
    // is still two hash aggregations; the oracle computes the same
    // scalars relationally (maps never cross the engine boundary —
    // only their derived values do, sorted-serialized for the profile
    // string).
    QueryDef(
      "q34_map_funcs",
      Some("""
        WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0) AS BIGINT) AS click_n,
               CAST(SUM(n) AS BIGINT) AS total_events,
               string_agg(event_type || ':' || CAST(n AS VARCHAR), ',' ORDER BY event_type) AS profile
        FROM c
        GROUP BY user_id
        ORDER BY user_id
      """.trim),
      (s, d) => {
        import s.implicits._
        events(s, d)
          .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
          .groupBy($"user_id")
          .agg(map_from_entries(collect_list(struct($"event_type", $"n"))).as("m"))
          .select($"user_id",
            size(map_keys($"m")).cast("long").as("n_types"),
            coalesce(element_at($"m", "click"), lit(0L)).as("click_n"),
            aggregate(map_values($"m"), lit(0L), (acc, x) => acc + x).as("total_events"),
            array_join(
              transform(array_sort(map_entries($"m")),
                e => concat(e.getField("key"), lit(":"),
                  e.getField("value").cast("string"))),
              ",").as("profile"))
          .orderBy($"user_id")
      }),

    // Schema-on-read with corrupt-record accounting — what a 100 TB
    // ingest actually faces: a fraction of the JSON column is mangled
    // (here deterministically, every 13th event loses its closing
    // brace) and the pipeline must parse what it can and COUNT what it
    // can't rather than fail. Spark side: from_json (PERMISSIVE →
    // null on corrupt) + null accounting; oracle: json_valid gates
    // json_extract. Row-local; one rollup.
    QueryDef(
      "q35_corrupt_json",
      Some("""
        WITH raw AS (
          SELECT event_type,
                 CASE WHEN event_id % 13 = 0
                      THEN replace(props, '}', '') ELSE props END AS j
          FROM events),
        p AS (
          SELECT event_type,
                 CASE WHEN json_valid(j)
                      THEN CAST(json_extract_string(j, '$.k') AS BIGINT) END AS k
          FROM raw)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) - COUNT(k) AS BIGINT) AS n_corrupt,
               CAST(SUM(k) AS BIGINT) AS k_sum
        FROM p
        GROUP BY event_type
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        val raw = events(s, d).select($"event_type",
          when($"event_id" % 13 === 0, regexp_replace($"props", "\\}", ""))
            .otherwise($"props").as("j"))
        raw
          .select($"event_type",
            from_json($"j", org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.LongType))))
              .getField("k").as("k"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            (count(lit(1)) - count($"k")).as("n_corrupt"),
            sum($"k").as("k_sum"))
          .orderBy($"event_type")
      }),

    // ANSI FILTER-clause aggregates, ONE text run verbatim by both
    // engines (the q30 dialect-agreement pattern): conditional
    // aggregation without CASE scaffolding — per priority, order
    // counts and clerk cardinalities sliced by status inline in the
    // aggregate list. Plans as a single hash aggregate with the
    // predicates folded into the partial buffers (no extra scans, no
    // join), exactly like the CASE form but declared the standard way.
    QueryDef(
      "q36_filter_agg",
      Some(Relational2.filterAggSql),
      (s, d) => {
        orders(s, d).createOrReplaceTempView("orders")
        s.sql(Relational2.filterAggSql)
      }),

    // CSV sink + source round-trip: a lineitem projection is written
    // as headered CSV (32-way parallel — the sink is a normal
    // distributed write), read back with an explicit DDL schema (never
    // inferSchema: a second full scan AND type drift at 100 TB), and
    // aggregated. The oracle aggregates the original parquet directly,
    // so a hash-match proves the text round-trip is LOSSLESS — longs
    // verbatim, doubles via Java's shortest-round-trip toString/parse.
    // DECIMAL-routed sums keep the aggregation order-independent.
    QueryDef(
      "q37_csv_roundtrip",
      Some(s"""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
               ${sqlSum("l_quantity")} AS sum_qty,
               ${sqlSum("l_extendedprice")} AS sum_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """.trim),
      (s, d) => {
        val out = s"/tmp/graft_rt_csv_${Integer.toHexString(d.hashCode)}"
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_returnflag"),
            col("l_quantity"), col("l_extendedprice"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read
          .option("header", "true")
          .schema("l_orderkey LONG, l_returnflag STRING, " +
            "l_quantity DOUBLE, l_extendedprice DOUBLE")
          .csv(out)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy(col("l_returnflag"))
      }),

    // ORC sink + source round-trip — same proof shape as q37 for the
    // other columnar format in the lake: binary types (including the
    // millisecond timestamp) survive verbatim, and the read-back
    // aggregation benefits from ORC's own column pruning. Monthly
    // revenue keyed by shipdate; the oracle never sees the ORC copy.
    QueryDef(
      "q38_orc_roundtrip",
      Some(s"""
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               CAST(COUNT(*) AS BIGINT) AS n,
               ${sqlSum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
        FROM lineitem
        GROUP BY 1
        ORDER BY 1
      """.trim),
      (s, d) => {
        val out = s"/tmp/graft_rt_orc_${Integer.toHexString(d.hashCode)}"
        lineitem(s, d)
          .select(col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("revenue"))
          .orderBy(col("ship_month"))
      }),

    // Semi-structured VARIANT column (Spark 4's native semi-structured
    // type): the JSON props column is parsed ONCE into a VariantType
    // value and fields are extracted with typed `variant_get` paths —
    // the shredded binary representation a lakehouse stores instead of
    // re-parsing JSON strings per access (q14 shows the string-path
    // formulation this supersedes). A missing path through
    // `try_variant_get` is NULL, counted as the absent-field audit.
    // DuckDB's JSON extraction is the oracle; all extracted values are
    // integers so the comparison is arithmetic-free.
    QueryDef(
      "q39_variant_props",
      Some("""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(COUNT(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_distinct,
               CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_max,
               CAST(COUNT(*) FILTER (WHERE json_extract(props, '$.absent') IS NULL) AS BIGINT) AS n_missing_absent
        FROM events
        GROUP BY event_type
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import s.implicits._
        events(s, d)
          .select($"event_type", parse_json($"props").as("v"))
          .select($"event_type",
            variant_get($"v", "$.k", "bigint").as("k"),
            try_variant_get($"v", "$.absent", "string").as("absent"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"),
            sum($"k").as("k_sum"),
            countDistinct($"k").as("k_distinct"),
            max($"k").as("k_max"),
            count(when($"absent".isNull, 1)).as("n_missing_absent"))
          .orderBy($"event_type")
      }),

    // Cross-table data-quality audit (Deequ-style constraint suite) —
    // the gate a curation pipeline runs before training data ships:
    // referential integrity (orphan FKs as left-anti joins — at scale
    // these are key-partitioned shuffles AQE can skew-split; the dim
    // sides it measures small it broadcasts on its own), primary-key
    // uniqueness (count vs distinct), and single-pass per-table
    // range/null checks (ONE conditional aggregate per table exploded
    // into constraint rows — not one scan per constraint). Output is
    // one row per named check with violation count, denominator, and
    // exact-division rate; integer counts end-to-end so the oracle is
    // arithmetic-free.
    QueryDef(
      "dq_integrity",
      Some("""
        WITH li AS (
          SELECT COUNT(*) AS total,
                 SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS qty_nonpos,
                 SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS disc_range,
                 SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS ok_null
          FROM lineitem),
        ord AS (
          SELECT COUNT(*) AS total,
                 SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS price_nonpos,
                 SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS ck_null,
                 COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_dup
          FROM orders),
        cust AS (
          SELECT COUNT(*) AS total,
                 COUNT(*) - COUNT(DISTINCT c_custkey) AS pk_dup
          FROM customer),
        all_checks AS (
          SELECT 'lineitem_quantity_nonpositive' AS check_name, qty_nonpos AS violations, total FROM li
          UNION ALL SELECT 'lineitem_discount_out_of_range', disc_range, total FROM li
          UNION ALL SELECT 'lineitem_orderkey_null', ok_null, total FROM li
          UNION ALL SELECT 'orders_totalprice_nonpositive', price_nonpos, total FROM ord
          UNION ALL SELECT 'orders_custkey_null', ck_null, total FROM ord
          UNION ALL SELECT 'orders_orderkey_unique', pk_dup, total FROM ord
          UNION ALL SELECT 'customer_custkey_unique', pk_dup, total FROM cust
          UNION ALL SELECT 'lineitem_orderkey_fk',
            (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
             WHERE o.o_orderkey IS NULL),
            (SELECT total FROM li)
          UNION ALL SELECT 'lineitem_partkey_fk',
            (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
             WHERE p.p_partkey IS NULL),
            (SELECT total FROM li)
          UNION ALL SELECT 'lineitem_suppkey_fk',
            (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
             WHERE s.s_suppkey IS NULL),
            (SELECT total FROM li)
          UNION ALL SELECT 'orders_custkey_fk',
            (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
             WHERE c.c_custkey IS NULL),
            (SELECT total FROM ord)
          UNION ALL SELECT 'lineitem_ship_before_order',
            (SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             WHERE l.l_shipdate < o.o_orderdate),
            (SELECT total FROM li))
        SELECT check_name,
               CAST(violations AS BIGINT) AS violations,
               CAST(total AS BIGINT) AS total,
               CAST(violations AS DOUBLE) / total AS viol_rate
        FROM all_checks
        ORDER BY check_name
      """.trim),
      (s, d) => {
        val li = lineitem(s, d)
        val ord = orders(s, d)
        val cust = customer(s, d)
        def row(name: String, viol: Column, total: Column) =
          struct(lit(name).as("check_name"), viol.cast("long").as("violations"),
            total.cast("long").as("total"))
        // one conditional aggregate per table → explode to check rows
        val liRows = li.agg(count(lit(1)).as("total"),
            sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("qty_nonpos"),
            sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("disc_range"),
            sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("ok_null"))
          .select(explode(array(
            row("lineitem_quantity_nonpositive", col("qty_nonpos"), col("total")),
            row("lineitem_discount_out_of_range", col("disc_range"), col("total")),
            row("lineitem_orderkey_null", col("ok_null"), col("total")))).as("r"))
        val ordRows = ord.agg(count(lit(1)).as("total"),
            sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("price_nonpos"),
            sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("ck_null"),
            (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"))
          .select(explode(array(
            row("orders_totalprice_nonpositive", col("price_nonpos"), col("total")),
            row("orders_custkey_null", col("ck_null"), col("total")),
            row("orders_orderkey_unique", col("pk_dup"), col("total")))).as("r"))
        val custRows = cust
          .agg(count(lit(1)).as("total"),
            (count(lit(1)) - countDistinct(col("c_custkey"))).as("pk_dup"))
          .select(explode(array(
            row("customer_custkey_unique", col("pk_dup"), col("total")))).as("r"))
        // referential checks: left-anti join + count, denominator from
        // the fact side's own count (crossJoin of two 1-row aggs)
        def fk(name: String, fact: DataFrame, key: Column, dim: DataFrame,
            dimKey: Column): DataFrame = {
          val viol = fact.select(key.as("k"))
            .join(dim.select(dimKey.as("k")), Seq("k"), "left_anti")
            .agg(count(lit(1)).as("violations"))
          val tot = fact.agg(count(lit(1)).as("total"))
          viol.crossJoin(tot)
            .select(row(name, col("violations"), col("total")).as("r"))
        }
        val shipBefore = li.select(col("l_orderkey"), col("l_shipdate"))
          .join(ord.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .agg(sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
            .as("violations"))
          .crossJoin(li.agg(count(lit(1)).as("total")))
          .select(row("lineitem_ship_before_order", col("violations"), col("total")).as("r"))
        Seq(liRows, ordRows, custRows,
            fk("lineitem_orderkey_fk", li, col("l_orderkey"), ord, col("o_orderkey")),
            fk("lineitem_partkey_fk", li, col("l_partkey"), part(s, d), col("p_partkey")),
            fk("lineitem_suppkey_fk", li, col("l_suppkey"), supplier(s, d), col("s_suppkey")),
            fk("orders_custkey_fk", ord, col("o_custkey"), cust, col("c_custkey")),
            shipBefore)
          .reduce(_ unionByName _)
          .select(col("r.check_name").as("check_name"),
            col("r.violations").as("violations"), col("r.total").as("total"),
            (col("r.violations").cast("double") / col("r.total")).as("viol_rate"))
          .orderBy(col("check_name"))
      })
  )

  /** Shared verbatim text for q36_filter_agg (ANSI FILTER clause).
    * A `def`, not a `val`: `defs` above interpolates it at object
    * init, which runs top-down — a later val would still be null
    * there (the ta_pii_redaction lesson). STRING not VARCHAR: Spark
    * rejects bare VARCHAR; both engines accept STRING. */
  def filterAggSql: String = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS custs_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_value,
           CAST(MIN(o_orderdate) FILTER (WHERE o_orderstatus = 'O') AS STRING) AS first_open_date
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
  """.trim
}
