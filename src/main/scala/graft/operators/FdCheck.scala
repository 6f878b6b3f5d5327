package graft.operators

import graft.QueryDef
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Functional-dependency audit — the data-profiling primitive behind
  * schema inference and key discovery (Papenbrock et al., VLDB 2015):
  * for each candidate FD X→Y, count the X-keys that map to MORE than
  * one distinct Y (violations), the worst key's fan-out, and the
  * holds/violated verdict. The candidate set mixes true keys, a
  * join-derived dependency, and two deliberately false FDs, so the
  * audit's discriminating power is itself under test.
  *
  * Determinism: pure integer counting.
  *
  * Scale: each FD is ONE two-level hash aggregate (X,Y → X) with
  * map-side combine — the standard distinct-count-per-key shape; the
  * five audits union into one plan and share nothing, so they
  * parallelize as independent stages.
  */
object FdCheck {

  private def audit(df: DataFrame, fd: String, lhs: String, rhs: String): DataFrame = {
    val keys = df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("nv"))
    keys.agg(
      lit(fd).as("fd"),
      count(lit(1)).cast("long").as("n_keys"),
      sum(when(col("nv") > 1, 1L).otherwise(0L)).cast("long").as("n_violating"),
      max(col("nv")).cast("long").as("max_fanout"),
      (max(col("nv")) === 1).as("holds"))
  }

  private def sqlAudit(fd: String, table: String, lhs: String, rhs: String): String =
    s"""SELECT '$fd' AS fd,
          CAST(COUNT(*) AS BIGINT) AS n_keys,
          CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
          CAST(MAX(nv) AS BIGINT) AS max_fanout,
          MAX(nv) = 1 AS holds
        FROM (SELECT $lhs, COUNT(DISTINCT $rhs) AS nv FROM $table GROUP BY $lhs)"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dq_fd_check",
      Some(s"""
        ${sqlAudit("customer.custkey->nationkey", "customer", "c_custkey", "c_nationkey")}
        UNION ALL
        ${sqlAudit("documents.doc_id->lang", "documents", "doc_id", "lang")}
        UNION ALL
        ${sqlAudit("events.user_id->event_type", "events", "user_id", "event_type")}
        UNION ALL
        ${sqlAudit("lineitem.orderkey->suppkey", "lineitem", "l_orderkey", "l_suppkey")}
        UNION ALL
        ${sqlAudit("orders.custkey->orderpriority", "orders", "o_custkey", "o_orderpriority")}
        ORDER BY fd
      """.trim),
      (s, d) => {
        val audits = Seq(
          audit(customer(s, d), "customer.custkey->nationkey", "c_custkey", "c_nationkey"),
          audit(documents(s, d), "documents.doc_id->lang", "doc_id", "lang"),
          audit(events(s, d), "events.user_id->event_type", "user_id", "event_type"),
          audit(lineitem(s, d), "lineitem.orderkey->suppkey", "l_orderkey", "l_suppkey"),
          audit(orders(s, d), "orders.custkey->orderpriority", "o_custkey", "o_orderpriority"))
        audits.reduce(_ unionByName _).orderBy(col("fd"))
      }))
}
