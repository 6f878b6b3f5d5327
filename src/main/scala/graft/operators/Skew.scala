package graft.operators

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
}
