package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-version diff — the audit a data-versioning layer (Delta /
  * Iceberg snapshot compare, or a curation pipeline's "what changed
  * between corpus v1 and v2") runs before promoting a new training
  * snapshot: per source, how many documents were added, removed,
  * changed (same id, different content hash), or untouched, plus the
  * churn rate.
  *
  * The two versions are carved deterministically from the fixture
  * corpus with [[PortableHash]] (v1 drops ids hashing ≡0 mod 19, v2
  * drops ≡0 mod 17 and uppercases ≡0 mod 13 — disjoint enough that
  * all four verdicts occur), so the oracle sees the identical
  * versions; on a real lake both sides are just two snapshot reads.
  *
  * Scale: two scans + ONE full-outer equi-join hash-partitioned on
  * doc_id; change detection compares md5 content hashes, never text;
  * output is |sources| rows from a map-side-combined aggregate.
  */
object SnapshotDiff {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_snapshot_diff", {
        val h = PortableHash.sqlH32("text")
        Some(s"""
        WITH v1 AS (
          SELECT doc_id, source, md5(text) AS h
          FROM documents WHERE $h % 19 <> 0),
        v2 AS (
          SELECT doc_id, source,
                 md5(CASE WHEN $h % 13 = 0 THEN upper(text) ELSE text END) AS h
          FROM documents WHERE $h % 17 <> 0),
        d AS (
          SELECT COALESCE(a.source, b.source) AS source,
                 CASE WHEN a.doc_id IS NULL THEN 'added'
                      WHEN b.doc_id IS NULL THEN 'removed'
                      WHEN a.h <> b.h THEN 'changed'
                      ELSE 'unchanged' END AS verdict
          FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        SELECT source,
               CAST(SUM(CASE WHEN verdict = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN verdict = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
               CAST(SUM(CASE WHEN verdict = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
               CAST(SUM(CASE WHEN verdict = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
               ${det.sqlSnap9(
            "SUM(CASE WHEN verdict <> 'unchanged' THEN 1 ELSE 0 END) * 1.0 / COUNT(*)")} AS churn_rate
        FROM d
        GROUP BY source
        ORDER BY source
      """.trim)
      },
      (s, d) => {
        val h = PortableHash.h32(col("text"))
        val docs = documents(s, d)
        val v1 = docs.filter(h % 19 =!= 0)
          .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
        val v2 = docs.filter(h % 17 =!= 0)
          .select(col("doc_id"), col("source"),
            md5(when(h % 13 === 0, upper(col("text")))
              .otherwise(col("text"))).as("h"))
        val diff = v1.as("a").join(v2.as("b"),
            col("a.doc_id") === col("b.doc_id"), "full_outer")
          .select(coalesce(col("a.source"), col("b.source")).as("source"),
            when(col("a.doc_id").isNull, "added")
              .when(col("b.doc_id").isNull, "removed")
              .when(col("a.h") =!= col("b.h"), "changed")
              .otherwise("unchanged").as("verdict"))
        diff.groupBy(col("source"))
          .agg(
            sum(when(col("verdict") === "added", 1).otherwise(0)).cast("long").as("n_added"),
            sum(when(col("verdict") === "removed", 1).otherwise(0)).cast("long").as("n_removed"),
            sum(when(col("verdict") === "changed", 1).otherwise(0)).cast("long").as("n_changed"),
            sum(when(col("verdict") === "unchanged", 1).otherwise(0)).cast("long").as("n_unchanged"),
            det.snap9(sum(when(col("verdict") =!= "unchanged", 1).otherwise(0))
              * lit(1.0) / count(lit(1))).as("churn_rate"))
          .orderBy(col("source"))
      }))
}
