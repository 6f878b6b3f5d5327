package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiling datasheet — the first thing an engine runs against
  * an unfamiliar table: per column, row count, distinct count, null
  * count, and the modal value with its frequency (ties broken by the
  * lexicographically smallest value so the mode is well-defined in
  * both engines). One exact-distinct aggregate per profiled column —
  * each a single hash-shuffled groupBy; the per-table scans share one
  * pass per table via a multi-aggregate where columns come from the
  * same table. At 100 TB the exact distinct would route through the
  * HLL sketches ([[Sketches]]) — this is the exact datasheet variant.
  */
object Profile {

  /** Profile one column: (table, column, n_rows, n_distinct, n_null,
    * top_value, top_freq). The mode comes from a value-frequency
    * aggregate ordered (freq desc, value asc). */
  private def profileCol(df: DataFrame, table: String, column: String): DataFrame = {
    val c = col(column).cast("string")
    val freq = df.select(c.as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("f"))
    val top = freq.filter(col("v").isNotNull)
      .orderBy(col("f").desc, col("v")).limit(1)
      .select(col("v").as("top_value"), col("f").as("top_freq"))
    val stats = df.agg(
      count(lit(1)).as("n_rows"),
      count_distinct(c).as("n_distinct"),
      sum(when(c.isNull, 1).otherwise(0)).as("n_null"))
    stats.crossJoin(top)
      .select(lit(table).as("table_name"), lit(column).as("column_name"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("n_null").cast("long").as("n_null"),
        col("top_value"), col("top_freq").cast("long").as("top_freq"))
  }

  private def sqlProfile(table: String, column: String): String =
    s"""SELECT '$table' AS table_name, '$column' AS column_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM $table) AS n_rows,
       (SELECT CAST(COUNT(DISTINCT CAST($column AS VARCHAR)) AS BIGINT) FROM $table) AS n_distinct,
       (SELECT CAST(SUM(CASE WHEN $column IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM $table) AS n_null,
       t.top_value, t.top_freq
       FROM (SELECT CAST($column AS VARCHAR) AS top_value, CAST(COUNT(*) AS BIGINT) AS top_freq
             FROM $table WHERE $column IS NOT NULL
             GROUP BY 1 ORDER BY COUNT(*) DESC, 1 LIMIT 1) t"""

  private val cols: Seq[(String, String)] = Seq(
    "customer" -> "c_mktsegment",
    "customer" -> "c_nationkey",
    "documents" -> "lang",
    "documents" -> "source",
    "events" -> "event_type",
    "lineitem" -> "l_returnflag",
    "orders" -> "o_orderpriority",
    "orders" -> "o_orderstatus",
    "part" -> "p_brand")

  private def table(s: SparkSession, d: String, name: String): DataFrame =
    name match {
      case "customer" => customer(s, d)
      case "documents" => documents(s, d)
      case "events" => events(s, d)
      case "lineitem" => lineitem(s, d)
      case "orders" => orders(s, d)
      case "part" => part(s, d)
    }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "dq_profile",
      Some(cols.map { case (t, c) => sqlProfile(t, c) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")),
      (s, d) => {
        val parts = cols.map { case (t, c) => profileCol(table(s, d, t), t, c) }
        parts.reduce(_.unionAll(_))
          .orderBy(col("table_name"), col("column_name"))
      }))
}
