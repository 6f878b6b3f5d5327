package graft.operators

import graft.QueryDef
import graft.det
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level drift audit between two corpus snapshots — the check a
  * data-contract / monitoring layer runs when a new dump lands: per
  * column, row counts, category counts, total-variation distance
  * between the two categorical distributions, and the bits-bucketed
  * PSI ([[Psi]]'s integer-log2 recipe) over categories with support
  * on both sides. Versions are the [[SnapshotDiff]] carving, so the
  * "changed" docs genuinely shift the text-length column.
  *
  * Columns profile as categoricals: `lang`/`source` by value,
  * `n_chars` and `length(text)` by fixed-width bucket — one melt
  * (4 unions), one (version, col, cat) count, per-col totals joined
  * back broadcast-sized. TVD terms are per-row doubles snapped then
  * DECIMAL-summed, so partitioning cannot move the result.
  *
  * Scale: melt is row-local (4× scan fan-out of two filtered scans);
  * everything after the first count is |cols|·|cats| rows.
  */
object SchemaDrift {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_schema_drift", {
        val h = PortableHash.sqlH32("text")
        def melt(src: String) = s"""
          SELECT 'lang' AS colname, lang AS cat FROM $src
          UNION ALL SELECT 'source', source FROM $src
          UNION ALL SELECT 'n_chars', CAST(n_chars // 200 AS VARCHAR) FROM $src
          UNION ALL SELECT 'text_len', CAST(length(text) // 500 AS VARCHAR) FROM $src"""
        Some(s"""
        WITH v1 AS (
          SELECT lang, source, n_chars, text
          FROM documents WHERE $h % 19 <> 0),
        v2 AS (
          SELECT lang, source, n_chars,
                 CASE WHEN $h % 13 = 0 THEN upper(text) ELSE text END AS text
          FROM documents WHERE $h % 17 <> 0),
        m1 AS (${melt("v1")}),
        m2 AS (${melt("v2")}),
        c1 AS (SELECT colname, cat, COUNT(*) AS n1 FROM m1 GROUP BY 1, 2),
        c2 AS (SELECT colname, cat, COUNT(*) AS n2 FROM m2 GROUP BY 1, 2),
        j AS (
          SELECT COALESCE(c1.colname, c2.colname) AS colname,
                 COALESCE(c1.cat, c2.cat) AS cat,
                 COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2
          FROM c1 FULL OUTER JOIN c2
            ON c1.colname = c2.colname AND c1.cat = c2.cat),
        t AS (
          SELECT colname, SUM(n1) AS t1, SUM(n2) AS t2,
                 SUM(CASE WHEN n1 > 0 THEN 1 ELSE 0 END) AS cats1,
                 SUM(CASE WHEN n2 > 0 THEN 1 ELSE 0 END) AS cats2
          FROM j GROUP BY colname),
        terms AS (
          SELECT j.colname,
                 CAST(${det.sqlSnap9(
          "abs(n1 * 1.0 / t1 - n2 * 1.0 / t2)")} AS DECIMAL(38,12)) AS tvd_term,
                 CASE WHEN n1 > 0 AND n2 > 0 THEN
                   CAST(${det.sqlSnap9(
          "(n1 * 1.0 / t1 - n2 * 1.0 / t2) * floor(log2((n1 * t2) * 1.0 / (n2 * t1)))")}
                     AS DECIMAL(38,12)) ELSE CAST(0 AS DECIMAL(38,12)) END AS psi_term
          FROM j JOIN t ON t.colname = j.colname)
        SELECT t.colname,
               CAST(t1 AS BIGINT) AS n_v1, CAST(t2 AS BIGINT) AS n_v2,
               CAST(cats1 AS BIGINT) AS cats_v1, CAST(cats2 AS BIGINT) AS cats_v2,
               CAST(SUM(tvd_term) AS DOUBLE) / 2 AS tvd,
               CAST(SUM(psi_term) AS DOUBLE) AS psi_bits
        FROM terms JOIN t ON t.colname = terms.colname
        GROUP BY t.colname, t1, t2, cats1, cats2
        ORDER BY t.colname
      """.trim)
      },
      (s, d) => {
        val h = PortableHash.h32(col("text"))
        val docs = documents(s, d)
        val v1 = docs.filter(h % 19 =!= 0)
          .select(col("lang"), col("source"), col("n_chars"), col("text"))
        val v2 = docs.filter(h % 17 =!= 0)
          .select(col("lang"), col("source"), col("n_chars"),
            when(h % 13 === 0, upper(col("text"))).otherwise(col("text"))
              .as("text"))
        def melt(v: DataFrame): DataFrame = Seq(
          v.select(lit("lang").as("colname"), col("lang").as("cat")),
          v.select(lit("source").as("colname"), col("source").as("cat")),
          v.select(lit("n_chars").as("colname"),
            floor(col("n_chars") / 200).cast("string").as("cat")),
          v.select(lit("text_len").as("colname"),
            floor(length(col("text")) / 500).cast("string").as("cat")))
          .reduce(_ unionByName _)
        val c1 = melt(v1).groupBy(col("colname"), col("cat"))
          .agg(count(lit(1)).as("n1"))
        val c2 = melt(v2).groupBy(col("colname"), col("cat"))
          .agg(count(lit(1)).as("n2"))
        val j = c1.as("a").join(c2.as("b"),
            col("a.colname") === col("b.colname") && col("a.cat") === col("b.cat"),
            "full_outer")
          .select(coalesce(col("a.colname"), col("b.colname")).as("colname"),
            coalesce(col("n1"), lit(0L)).as("n1"),
            coalesce(col("n2"), lit(0L)).as("n2"))
        val t = j.groupBy(col("colname").as("t_col"))
          .agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"),
            sum(when(col("n1") > 0, 1).otherwise(0)).as("cats1"),
            sum(when(col("n2") > 0, 1).otherwise(0)).as("cats2"))
        val p1 = col("n1") * lit(1.0) / col("t1")
        val p2 = col("n2") * lit(1.0) / col("t2")
        val terms = j.join(broadcast(t), col("colname") === col("t_col"))
          .select(col("colname"), col("t1"), col("t2"), col("cats1"), col("cats2"),
            det.snap9(abs(p1 - p2)).cast(DecimalType(38, 12)).as("tvd_term"),
            when(col("n1") > 0 && col("n2") > 0,
              det.snap9((p1 - p2) * floor(log2((col("n1") * col("t2"))
                * lit(1.0) / (col("n2") * col("t1")))))
                .cast(DecimalType(38, 12)))
              .otherwise(lit(0).cast(DecimalType(38, 12))).as("psi_term"))
        terms.groupBy(col("colname"), col("t1"), col("t2"),
            col("cats1"), col("cats2"))
          .agg(sum(col("tvd_term")).cast("double").as("tvd0"),
            sum(col("psi_term")).cast("double").as("psi_bits"))
          .select(col("colname"),
            col("t1").cast("long").as("n_v1"), col("t2").cast("long").as("n_v2"),
            col("cats1").cast("long").as("cats_v1"),
            col("cats2").cast("long").as("cats_v2"),
            (col("tvd0") / 2).as("tvd"), col("psi_bits"))
          .orderBy(col("colname"))
      }))
}
