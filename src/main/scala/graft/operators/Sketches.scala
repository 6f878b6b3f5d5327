package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables.{customer, events, orders}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Bloom filter build + membership probe.
  *
  * `DataFrame.stat.bloomFilter` collects the finished filter to the
  * driver; this build instead keeps the filter AS A TABLE of set bit
  * positions (≤ m rows), so both construction (explode k positions per
  * member → distinct) and probing (position join → all-k-hit per key)
  * are shuffles on small keys — the pattern that survives a member set
  * too big for any single heap, and the same shape a semijoin-reduction
  * filter takes on a real cluster. The hash family is the portable
  * MD5-based [[PortableHash]] universal family, so DuckDB mirrors the
  * whole filter bit-for-bit and the driver hash-checks every count —
  * including the false-positive count, not just an invariant.
  *
  * m/k are sized for the sf0.01 member cardinality (~135 members,
  * m=2048, k=4 → a handful of false positives, so the FP accounting is
  * actually exercised); production sizing scales m with expected n at
  * constant bits-per-element.
  */
object Sketches {

  val m = 2048
  val k = 4

  /** The k portable bit positions for a string key column. */
  private def positions(c: org.apache.spark.sql.Column) = {
    val h = PortableHash.h32(c)
    array((0 until k).map(i => PortableHash.uhash(h, i) % m): _*)
  }

  private def sqlPositions(e: String): String =
    (0 until k).map(i => s"(${PortableHash.sqlUhash(PortableHash.sqlH32(e), i)} % $m)")
      .mkString("[", ", ", "]")

  /** Set-bit table (col `pos`) for a member DataFrame keyed by `key`. */
  def bloomBuild(members: DataFrame): DataFrame =
    members
      .select(explode(positions(col("key").cast("string"))).as("pos"))
      .distinct()

  /** Probe: adds boolean `bloom_hit` (all k positions set) per row of
    * `probe` (keyed by `key`). Bits side is ≤ m rows → broadcast.
    *
    * Contract: probe rows must be distinct and `key` non-null — the
    * per-row regroup collapses duplicate tuples, and a null key
    * explodes to zero rows. Pre-aggregate (or `coalesce`) the probe
    * side first when feeding raw streams; [[cmEstimate]] has the same
    * contract. */
  def bloomProbe(probe: DataFrame, bits: DataFrame): DataFrame = {
    val exploded = probe
      .withColumn("pos", explode(positions(col("key").cast("string"))))
    exploded
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy(probe.columns.map(col): _*)
      .agg((min(coalesce(col("hit"), lit(0))) === 1).as("bloom_hit"))
  }

  /** Count-Min sketch dimensions: depth d (independent hash rows) ×
    * width w (counters per row). Point-estimate error is bounded by
    * e·N/w with probability 1 − e^−d; w=1024 over the sf0.01 event
    * stream (10k rows) bounds overcount by ~27 per probe. Hash rows
    * use [[PortableHash.minhashParams]] 4–7 (0–3 drive the Bloom
    * filter above) so the two sketch demos are decorrelated.
    */
  val cmDepth = 4
  val cmWidth = 1024

  private def cmEntries(c: org.apache.spark.sql.Column) = {
    val h = PortableHash.h32(c)
    array((0 until cmDepth).map(i =>
      struct(lit(i).as("depth"),
        (PortableHash.uhash(h, 4 + i) % cmWidth).as("pos"))): _*)
  }

  /** The Count-Min counter table (`depth`, `pos`, `cnt`; ≤ d·w rows)
    * for a stream keyed by `key` — one explode + one groupBy, the
    * map-side-combining shape that turns an arbitrarily large stream
    * into a fixed-size table no matter the key cardinality. */
  def cmBuild(stream: DataFrame): DataFrame =
    stream
      .select(explode(cmEntries(col("key").cast("string"))).as("e"))
      .groupBy(col("e.depth").as("depth"), col("e.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probes` (keyed by `key`): min over the d
    * counters each key hashes to. The sketch side is ≤ d·w rows →
    * broadcast; a missing counter means zero occurrences. */
  def cmEstimate(probes: DataFrame, cm: DataFrame): DataFrame =
    probes
      .withColumn("e", explode(cmEntries(col("key").cast("string"))))
      .join(broadcast(cm),
        col("e.depth") === cm("depth") && col("e.pos") === cm("pos"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))

  /** Bottom-k sketch size. */
  val bk = 16

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      // Bottom-k distinct sketch: the k smallest h32(key) values are
      // simultaneously (a) a uniform, MERGEABLE sample of the distinct
      // keys (union two sketches, keep the k smallest — the streaming/
      // shard-parallel shape), and (b) a cardinality estimator via the
      // k-th minimum: est = (k-1)·2^32/h_k. One distinct + one top-k —
      // no state bigger than k rows anywhere. The oracle mirrors the
      // hash family, so the driver checks the estimate, the sample
      // membership, AND the relative-error flag.
      "sk_bottomk", {
        val h = PortableHash.sqlH32("CAST(user_id AS VARCHAR)")
        Some(s"""
          WITH hashed AS (
            SELECT DISTINCT user_id, $h AS h FROM events),
          bottom AS (
            SELECT user_id, h FROM hashed ORDER BY h, user_id LIMIT $bk),
          agg AS (
            SELECT MAX(h) AS hk,
                   string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY h, user_id) AS sample_keys
            FROM bottom),
          exact AS (SELECT COUNT(*) AS n FROM hashed)
          SELECT CAST($bk AS BIGINT) AS k,
                 CAST(agg.hk AS BIGINT) AS kth_min_hash,
                 CAST(${bk - 1} * 4294967296.0 AS DOUBLE) / agg.hk AS est_distinct,
                 CAST(exact.n AS BIGINT) AS exact_distinct,
                 abs(CAST(${bk - 1} * 4294967296.0 AS DOUBLE) / agg.hk - exact.n)
                   / exact.n < 0.6 AS within_bound,
                 agg.sample_keys
          FROM agg CROSS JOIN exact
        """.trim)
      },
      (s, d) => {
        val hashed = events(s, d).select(col("user_id")).distinct()
          .select(col("user_id"), PortableHash.h32(col("user_id").cast("string")).as("h"))
        val bottom = hashed.orderBy(col("h"), col("user_id")).limit(bk)
        // collect_list order: feed it pre-sorted rows from the limit's
        // single ordered partition (coalesce(1) pins it)
        val aggOrdered = bottom.coalesce(1)
          .sortWithinPartitions(col("h"), col("user_id"))
          .agg(max(col("h")).as("hk"),
            concat_ws(",", collect_list(col("user_id").cast("string"))).as("sample_keys"))
        val exact = hashed.agg(count(lit(1)).as("n"))
        aggOrdered.crossJoin(exact)
          .select(
            lit(bk.toLong).as("k"),
            col("hk").cast("bigint").as("kth_min_hash"),
            (lit((bk - 1) * 4294967296.0) / col("hk")).as("est_distinct"),
            col("n").as("exact_distinct"),
            (abs(lit((bk - 1) * 4294967296.0) / col("hk") - col("n")) / col("n") < 0.6)
              .as("within_bound"),
            col("sample_keys"))
      }),
    QueryDef(
      "sk_countmin", {
        val ent = (0 until cmDepth).map { i =>
          val pos = s"(${PortableHash.sqlUhash(PortableHash.sqlH32("CAST(user_id AS VARCHAR)"), 4 + i)} % $cmWidth)"
          s"SELECT user_id, $i AS depth, $pos AS pos FROM events"
        }.mkString(" UNION ALL ")
        Some(s"""
          WITH ent AS ($ent),
          cm AS (
            SELECT depth, pos, COUNT(*) AS cnt FROM ent GROUP BY depth, pos),
          exact AS (
            SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id),
          top AS (
            SELECT user_id, exact_cnt FROM exact
            ORDER BY exact_cnt DESC, user_id LIMIT 20),
          est AS (
            SELECT e.user_id, MIN(cm.cnt) AS cm_est
            FROM (SELECT DISTINCT user_id, depth, pos FROM ent
                  WHERE user_id IN (SELECT user_id FROM top)) e
            JOIN cm ON cm.depth = e.depth AND cm.pos = e.pos
            GROUP BY e.user_id)
          SELECT CAST(t.user_id AS BIGINT) AS user_id,
                 CAST(t.exact_cnt AS BIGINT) AS exact_cnt,
                 CAST(est.cm_est AS BIGINT) AS cm_est,
                 est.cm_est >= t.exact_cnt AS never_undercounts,
                 est.cm_est - t.exact_cnt <= 40 AS within_bound
          FROM top t JOIN est ON est.user_id = t.user_id
          ORDER BY t.user_id
        """.trim)
      },
      (s, d) => {
        val ev = events(s, d).select(col("user_id").as("key"))
        val cm = cmBuild(ev)
        val exact = ev.groupBy(col("key")).agg(count(lit(1)).as("exact_cnt"))
        val top = exact
          .orderBy(col("exact_cnt").desc, col("key")).limit(20)
        cmEstimate(top, cm)
          .select(
            col("key").cast("bigint").as("user_id"),
            col("exact_cnt"),
            col("cm_est"),
            (col("cm_est") >= col("exact_cnt")).as("never_undercounts"),
            (col("cm_est") - col("exact_cnt") <= 40).as("within_bound"))
          .orderBy(col("user_id"))
      }),
    QueryDef(
      "sk_bloom", {
        val pos = sqlPositions("CAST(k AS VARCHAR)")
        Some(s"""
          WITH members AS (
            SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000),
          bits AS (
            SELECT DISTINCT UNNEST($pos) AS pos FROM members),
          probe AS (
            SELECT c_custkey AS k, c_nationkey, c_acctbal > 9000 AS exact_in
            FROM customer),
          ppos AS (
            SELECT k, c_nationkey, exact_in, UNNEST($pos) AS pos FROM probe),
          hits AS (
            SELECT k, c_nationkey, exact_in,
                   MIN(CASE WHEN bits.pos IS NULL THEN 0 ELSE 1 END) = 1 AS bloom_hit
            FROM ppos LEFT JOIN bits USING (pos)
            GROUP BY k, c_nationkey, exact_in)
          SELECT CAST(c_nationkey AS BIGINT) AS nation,
                 CAST(COUNT(*) AS BIGINT) AS probes,
                 CAST(SUM(CASE WHEN exact_in THEN 1 ELSE 0 END) AS BIGINT) AS exact_members,
                 CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS bloom_positives,
                 CAST(SUM(CASE WHEN bloom_hit AND NOT exact_in THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
                 CAST(SUM(CASE WHEN exact_in AND NOT bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives
          FROM hits
          GROUP BY c_nationkey
          ORDER BY nation
        """.trim)
      },
      (s, d) => {
        val cust = customer(s, d)
        val members = cust.filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("key"))
        val bits = bloomBuild(members)
        val probe = cust.select(
          col("c_custkey").as("key"),
          col("c_nationkey"),
          (col("c_acctbal") > 9000).as("exact_in"))
        bloomProbe(probe, bits)
          .groupBy(col("c_nationkey"))
          .agg(
            count(lit(1)).as("probes"),
            sum(when(col("exact_in"), 1L).otherwise(0L)).as("exact_members"),
            sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("bloom_positives"),
            sum(when(col("bloom_hit") && !col("exact_in"), 1L).otherwise(0L)).as("false_positives"),
            sum(when(col("exact_in") && !col("bloom_hit"), 1L).otherwise(0L)).as("false_negatives"))
          .select(
            col("c_nationkey").cast("bigint").as("nation"),
            col("probes"), col("exact_members"), col("bloom_positives"),
            col("false_positives"), col("false_negatives"))
          .orderBy(col("nation"))
      }),

    // Bloom-filter JOIN pre-filtering — the runtime-filter pattern that
    // matters at 100 TB: the small side's key set compresses to a
    // broadcastable bit table; the fact side drops non-members BEFORE
    // its shuffle, so the join exchanges only (true matches + false
    // positives) instead of the whole fact table. The row hash-checks
    // the guarantee that makes the pattern safe (no false drops: the
    // pre-filtered join count equals the plain join count) and the
    // payoff (the filtered fraction), both as exact values.
    QueryDef(
      "sk_bloom_join", {
        val pos = sqlPositions("CAST(k AS VARCHAR)")
        Some(s"""
          WITH members AS (
            SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000),
          bits AS (
            SELECT DISTINCT UNNEST($pos) AS pos FROM members),
          probe AS (
            SELECT o_orderkey AS okey, o_custkey AS k FROM orders),
          ppos AS (
            SELECT okey, k, UNNEST($pos) AS pos FROM probe),
          hits AS (
            SELECT okey, k,
                   MIN(CASE WHEN bits.pos IS NULL THEN 0 ELSE 1 END) = 1 AS bloom_hit
            FROM ppos LEFT JOIN bits USING (pos)
            GROUP BY okey, k),
          passed AS (SELECT okey, k FROM hits WHERE bloom_hit),
          joined AS (SELECT COUNT(*) AS n FROM passed p JOIN members m ON p.k = m.k),
          plain AS (SELECT COUNT(*) AS n FROM probe p JOIN members m ON p.k = m.k),
          stats AS (SELECT COUNT(*) AS n_orders,
                           (SELECT COUNT(*) FROM passed) AS n_passed
                    FROM probe)
          SELECT CAST(stats.n_orders AS BIGINT) AS n_orders,
                 CAST(stats.n_passed AS BIGINT) AS n_passed,
                 CAST(joined.n AS BIGINT) AS n_joined,
                 joined.n = plain.n AS no_false_drops,
                 (stats.n_orders - stats.n_passed) * 1.0 / stats.n_orders AS filtered_frac
          FROM stats, joined, plain
        """.trim)
      },
      (s, d) => {
        val members = customer(s, d).filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("key"))
        val bits = bloomBuild(members)
        val probe = orders(s, d)
          .select(col("o_orderkey").as("okey"), col("o_custkey").as("key"))
        val flagged = bloomProbe(probe, bits).localCheckpoint()
        val passed = flagged.filter(col("bloom_hit"))
        val nJoined = passed.join(members, "key")
          .agg(count(lit(1)).as("n_joined"))
        val nPlain = probe.join(members, "key")
          .agg(count(lit(1)).as("n_plain"))
        val stats = flagged.agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_passed"))
        stats.crossJoin(nJoined).crossJoin(nPlain)
          .select(col("n_orders"), col("n_passed"), col("n_joined"),
            (col("n_joined") === col("n_plain")).as("no_false_drops"),
            ((col("n_orders") - col("n_passed")) * lit(1.0) / col("n_orders"))
              .as("filtered_frac"))
      }),

    // Approximate quantiles (Greenwald–Khanna, Spark's
    // approx_percentile) checked against the exact DISCRETE quantile —
    // the same exact-side + guaranteed-invariant oracle pattern as the
    // other sk_* rows: the approx VALUE can vary with merge order, so
    // the hashed output carries the exact quantile and a boolean that
    // the approx answer's RANK sits within twice the algorithm's
    // n/accuracy guarantee — deterministically true however the
    // mergeable sketch was assembled. Discrete (element-at-rank)
    // quantiles, not interpolated, so the exact side is bit-portable
    // with no float arithmetic (the ev_winsorize midpoint lesson).
    QueryDef(
      "sk_approx_quantiles",
      Some("""
        WITH ranked AS (
          SELECT event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM events),
        disc AS (
          SELECT event_type,
                 MAX(n) AS n,
                 MAX(CASE WHEN rn = CAST(ceil(n * CAST(0.5 AS DOUBLE)) AS BIGINT) THEN value END) AS p50_disc,
                 MAX(CASE WHEN rn = CAST(ceil(n * CAST(0.95 AS DOUBLE)) AS BIGINT) THEN value END) AS p95_disc
          FROM ranked GROUP BY event_type)
        SELECT event_type, CAST(n AS BIGINT) AS n, p50_disc, p95_disc,
               TRUE AS rank_ok_50, TRUE AS rank_ok_95
        FROM disc
        ORDER BY event_type
      """.trim),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = events(s, d).select(col("event_type"), col("value"))
        val ranked = ev
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("value"))).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
        val disc = ranked.groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            max(when(col("rn") === ceil(col("n") * lit(0.5)).cast("long"), col("value"))).as("p50_disc"),
            max(when(col("rn") === ceil(col("n") * lit(0.95)).cast("long"), col("value"))).as("p95_disc"))
        val approx = ev.groupBy(col("event_type"))
          .agg(expr("approx_percentile(value, 0.5, 100)").as("a50"),
            expr("approx_percentile(value, 0.95, 100)").as("a95"))
        val ranks = ev.join(broadcast(approx), "event_type")
          .groupBy(col("event_type"))
          .agg(count(when(col("value") <= col("a50"), 1)).as("le50"),
            count(when(col("value") <= col("a95"), 1)).as("le95"))
        disc.join(ranks, "event_type")
          .select(col("event_type"), col("n"), col("p50_disc"), col("p95_disc"),
            (abs(col("le50") - ceil(col("n") * lit(0.5)).cast("long"))
              <= lit(2.0) * col("n") / 100 + 1).as("rank_ok_50"),
            (abs(col("le95") - ceil(col("n") * lit(0.95)).cast("long"))
              <= lit(2.0) * col("n") / 100 + 1).as("rank_ok_95"))
          .orderBy(col("event_type"))
      })
  )
}
