package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables.customer
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
    * `probe` (keyed by `key`). Bits side is ≤ m rows → broadcast. */
  def bloomProbe(probe: DataFrame, bits: DataFrame): DataFrame = {
    val exploded = probe
      .withColumn("pos", explode(positions(col("key").cast("string"))))
    exploded
      .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy(probe.columns.map(col): _*)
      .agg((min(coalesce(col("hit"), lit(0))) === 1).as("bloom_hit"))
  }

  val defs: Seq[QueryDef] = Seq(
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
      })
  )
}
