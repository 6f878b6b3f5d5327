package graft.operators

import graft.{det, QueryDef}
import graft.sources.Tables.{lineitem, supplier}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins.
  *
  * AQE's skew-join handles most cases at runtime; salting is the
  * explicit tool when a dimension-to-fact join has keys so hot that
  * even split shuffle blocks overload single tasks. The fact side gets
  * a deterministic salt in [0, salts); the (smaller) other side is
  * replicated across all salts; the join key becomes (key, salt) so a
  * hot key's rows spread over `salts` reducers. Results are provably
  * identical to the unsalted join (asserted in the spec).
  */
object Skew {

  /** Inner equi-join of `fact` to `other` on `key`, salted `salts` ways.
    * The salt is a deterministic hash of the fact row's whole content so
    * reruns place rows identically (no rand() — reproducibility). */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(salts)))
    val saltsDf = fact.sparkSession.range(salts.toLong)
      .select(col("id").cast("int").as("__salt"))
    val replicatedOther = other.crossJoin(broadcast(saltsDf))
    saltedFact.join(replicatedOther,
        saltedFact(key) === replicatedOther(key) &&
          saltedFact("__salt") === replicatedOther("__salt"))
      .drop(replicatedOther(key)).drop("__salt")
  }

  /** Oracle-checked salted join: lineitem (fact) ⋈ supplier on
    * suppkey, salted 8 ways, aggregated per nation. Salting is
    * invisible in the result — the oracle is the PLAIN join — which is
    * exactly the property that makes it a safe skew mitigation. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "jx_salted_join",
      Some(s"""
        SELECT CAST(s_nationkey AS BIGINT) AS nation,
               COUNT(*) AS n,
               ${det.sqlSum("l_quantity")} AS qty_sum
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1
        ORDER BY 1
      """.trim),
      (s, d) => {
        val fact = lineitem(s, d).select(col("l_suppkey").as("suppkey"), col("l_quantity"))
        val dim = supplier(s, d).select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
        saltedJoin(fact, dim, "suppkey", salts = 8)
          .groupBy(col("s_nationkey").cast("bigint").as("nation"))
          .agg(count(lit(1)).as("n"), det.dsum(col("l_quantity")).as("qty_sum"))
          .orderBy(col("nation"))
      }))
}
