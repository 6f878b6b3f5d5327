package graft.operators

import graft.QueryDef
import graft.functions.PortableHash
import graft.sources.Tables._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted priority sampling (Duffield–Lund–Thorup, JACM'07) over the
  * documents table: item i gets priority q_i = w_i / u_i with u_i a
  * deterministic hash-uniform in (0, 1]; the k highest priorities form
  * a weighted sample WITHOUT replacement whose Horvitz–Thompson
  * estimate ŵ_i = max(w_i, τ) (τ = the (k+1)-th priority) is unbiased
  * for any subset-sum query — the one-pass weighted-sample primitive a
  * mixture builder wants when exact proportional splits (pl_mixture)
  * are too rigid.
  *
  * Scale shape: priorities are row-local; the top-(k+1) selection is a
  * TakeOrderedAndProject (never a global sort), and τ is a 1-row
  * broadcast. Deterministic end to end: u comes from the portable md5
  * hash, so both engines rank identical doubles.
  */
object PrioritySample {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "pl_priority_sample",
      Some(s"""
        WITH w AS (
          SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 (${PortableHash.sqlH32("CAST(doc_id AS VARCHAR)")} + 1)
                   / 4294967296.0 AS u
          FROM documents),
        pri AS (
          SELECT doc_id, n_tokens, n_tokens / u AS q FROM w),
        top AS (
          SELECT doc_id, n_tokens, q,
                 row_number() OVER (ORDER BY q DESC, doc_id) AS rk
          FROM pri ORDER BY q DESC, doc_id LIMIT 51),
        tau AS (
          SELECT COALESCE(MIN(CASE WHEN rk = 51 THEN q END), 0.0) AS tau
          FROM top)
        SELECT t.doc_id, t.n_tokens, t.q AS priority,
               CASE WHEN t.n_tokens * 1.0 > tau.tau
                    THEN t.n_tokens * 1.0 ELSE tau.tau END AS est_weight
        FROM top t CROSS JOIN tau
        WHERE t.rk <= 50
        ORDER BY t.doc_id
      """.trim),
      (s, d) => {
        import s.implicits._
        val w = documents(s, d).select($"doc_id",
          size(split($"text", " ")).cast("long").as("n_tokens"),
          ((PortableHash.h32($"doc_id".cast("string")) + 1) / lit(4294967296.0)).as("u"))
        val pri = w.select($"doc_id", $"n_tokens", ($"n_tokens" / $"u").as("q"))
        val top = pri.orderBy($"q".desc, $"doc_id").limit(51)
          .withColumn("rk", row_number().over(Window.orderBy($"q".desc, $"doc_id")))
        // aggregate form: stays a 1-row frame (tau = 0 ⇒ ŵ = w) when
        // the corpus itself is smaller than the sample budget
        val tau = top.agg(
          coalesce(min(when($"rk" === 51, $"q")), lit(0.0)).as("tau"))
        top.filter($"rk" <= 50)
          .crossJoin(broadcast(tau))
          .select($"doc_id", $"n_tokens", $"q".as("priority"),
            when($"n_tokens" * lit(1.0) > $"tau", $"n_tokens" * lit(1.0))
              .otherwise($"tau").as("est_weight"))
          .orderBy($"doc_id")
      }))
}
